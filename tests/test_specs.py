import json

import pytest

from prompture_ray.specs import CheckSpec, Suite, SpecError, load_suite, default_webpages_suite


def test_checkspec_validation_errors():
    with pytest.raises(SpecError):
        CheckSpec(id="x", column="c", kind="nope")
    with pytest.raises(SpecError):
        CheckSpec(id="x", column="c", kind="regex")  # no pattern
    with pytest.raises(SpecError):
        CheckSpec(id="x", column="c", kind="enum")  # no values
    with pytest.raises(SpecError):
        CheckSpec(id="x", column="c", kind="range")  # no bounds
    with pytest.raises(SpecError):
        CheckSpec(id="x", column="c", kind="referential")  # no ref


def test_suite_duplicate_ids():
    with pytest.raises(SpecError):
        Suite.from_dict({"checks": [
            {"id": "a", "column": "c", "kind": "not_null"},
            {"id": "a", "column": "d", "kind": "not_null"},
        ]})


def test_suite_roundtrip(tmp_path):
    suite = default_webpages_suite(ref_warc="warc_records")
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(suite.to_dict()))
    loaded = load_suite(p)
    assert [c.id for c in loaded.checks] == [c.id for c in suite.checks]
    assert loaded.check("lang-enum").values == suite.check("lang-enum").values
    assert loaded.check("ts-range").nullable is False
    assert len(loaded.row_checks) + len(loaded.table_checks) == len(loaded.checks)


def test_reason_tags():
    c = CheckSpec(id="r", column="url", kind="regex", pattern="x")
    assert c.reason() == "regex:url"
