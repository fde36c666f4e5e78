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


def test_suite_self_schema_validation(tmp_path):
    import json
    import pytest
    from prompture_ray.specs import SpecError, load_suite

    good = {"meta": {}, "checks": [
        {"id": "a", "column": "x", "kind": "not_null"}]}
    p = tmp_path / "s.json"
    p.write_text(json.dumps(good))
    assert len(load_suite(p).checks) == 1

    for bad in (
        {"meta": {}},                                        # no checks
        {"checks": []},                                      # empty checks
        {"checks": [{"column": "x", "kind": "not_null"}]},   # missing id
        {"checks": [{"id": "", "kind": "not_null"}]},        # empty id
        {"checks": [{"id": "a", "kind": 3}]},                # kind not str
    ):
        p.write_text(json.dumps(bad))
        with pytest.raises(SpecError):
            load_suite(p)


def test_load_plugins(tmp_path, monkeypatch):
    import sys
    from prompture_ray import specs

    mod = tmp_path / "my_plugin_mod.py"
    mod.write_text(
        "from prompture_ray.specs import register_check_kind\n"
        "import pyarrow.compute as pc\n"
        "register_check_kind('always_true_plugin',\n"
        "                    lambda c, t: pc.is_valid(t[c.column]))\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    try:
        assert specs.load_plugins("my_plugin_mod") == ["my_plugin_mod"]
        assert specs.custom_kernel("always_true_plugin") is not None
        import pytest
        with pytest.raises(ImportError):
            specs.load_plugins(["definitely_not_a_module_xyz"])
    finally:
        specs.reset_check_registry()
        sys.modules.pop("my_plugin_mod", None)
