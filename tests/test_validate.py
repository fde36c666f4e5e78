"""Vectorized check kernels vs a tiny Arrow table with known violations,
plus a pure-Python oracle over the synthetic table (SURVEY §5 strategy)."""

import datetime as dt
import re

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from prompture_ray.specs import CheckSpec, Suite, default_webpages_suite
from prompture_ray.stages.validate import ValidateBatch, eval_check


def tiny_table():
    return pa.table({
        "url": ["https://a.com/1", "not a url", None, "https://b.org/2", ""],
        "warc_ts": pa.array([
            dt.datetime(2021, 1, 1), dt.datetime(1999, 1, 1),
            dt.datetime(2022, 6, 1), None, dt.datetime(2030, 1, 1),
        ], type=pa.timestamp("us")),
        "lang": ["en", "xx", None, "de", "EN"],
        "n": [5, 50, 2, None, 7],
    })


def masks_for(spec_dict):
    return eval_check(CheckSpec.from_dict(spec_dict), tiny_table()).to_pylist()


def test_not_null():
    assert masks_for({"id": "x", "column": "url", "kind": "not_null"}) == \
        [True, True, False, True, True]


def test_regex_null_policy():
    # nullable default True → null passes vacuously
    assert masks_for({"id": "x", "column": "url", "kind": "regex",
                      "pattern": r"^https?://[^ ]+$"}) == \
        [True, False, True, True, False]
    # nullable False → null fails
    assert masks_for({"id": "x", "column": "url", "kind": "regex",
                      "pattern": r"^https?://[^ ]+$", "nullable": False}) == \
        [True, False, False, True, False]


def test_enum_and_case():
    assert masks_for({"id": "x", "column": "lang", "kind": "enum",
                      "values": ["en", "de"], "nullable": False}) == \
        [True, False, False, True, False]
    assert masks_for({"id": "x", "column": "lang", "kind": "enum",
                      "values": ["en", "de"], "case_insensitive": True,
                      "nullable": False}) == \
        [True, False, False, True, True]


def test_range_timestamp():
    assert masks_for({"id": "x", "column": "warc_ts", "kind": "range",
                      "min": "2008-01-01T00:00:00", "max": "2026-08-17T00:00:00",
                      "nullable": False}) == \
        [True, False, True, False, False]


def test_range_numeric():
    assert masks_for({"id": "x", "column": "n", "kind": "range",
                      "min": 3, "max": 10}) == \
        [True, False, False, True, True]


def test_length():
    assert masks_for({"id": "x", "column": "url", "kind": "length",
                      "min": 1}) == [True, True, True, True, False]


def test_type_check():
    assert all(masks_for({"id": "x", "column": "n", "kind": "type",
                          "dtype": "int64"}))
    assert not any(masks_for({"id": "x", "column": "n", "kind": "type",
                              "dtype": "string"}))


def test_violation_rows_shape():
    suite = Suite.from_dict({"meta": {}, "checks": [
        {"id": "url-regex", "column": "url", "kind": "regex",
         "pattern": r"^https?://[^ ]+$", "nullable": False},
        {"id": "lang-enum", "column": "lang", "kind": "enum",
         "values": ["en", "de"], "nullable": False},
    ]})
    vb = ValidateBatch(suite, key_col="url", mode="violations")
    viol = vb(tiny_table())
    assert viol.column_names == ["check_id", "row_key", "column", "ok",
                                 "reason", "observed"]
    assert viol.num_rows == 3 + 3
    assert set(viol["reason"].to_pylist()) == {"regex:url", "enum:lang"}
    assert not any(viol["ok"].to_pylist())
    # null key stringified
    assert "null" in viol["row_key"].to_pylist()


def test_first_failure_wins_reason():
    suite = Suite.from_dict({"meta": {}, "checks": [
        {"id": "a", "column": "url", "kind": "not_null"},
        {"id": "b", "column": "url", "kind": "regex", "pattern": r"^https",
         "nullable": False},
    ]})
    out = ValidateBatch(suite, key_col="url")(tiny_table())
    # row 2 (null url) fails both; reason must be the FIRST check's
    assert out["reason"].to_pylist()[2] == "not_null:url"
    assert out["ok"].to_pylist() == [True, False, False, True, False]


def test_observed_truncated():
    t = pa.table({"url": ["x" * 300]})
    suite = Suite.from_dict({"meta": {}, "checks": [
        {"id": "r", "column": "url", "kind": "regex", "pattern": r"^https"}]})
    viol = ValidateBatch(suite, key_col="url", mode="violations")(t)
    assert len(viol["observed"].to_pylist()[0]) == 80


def python_oracle(rows, suite):
    """Pure-Python reimplementation of the reference validation semantics
    (validate_against_schema + filter-reason shapes) used as the oracle."""
    url_re = re.compile(r"^https?://[^ ]+$")
    lo = dt.datetime(2008, 1, 1)
    hi = dt.datetime(2026, 8, 17)
    langs = set(suite.check("lang-enum").values)
    out = []
    for r in rows:
        reasons = []
        if r["url"] is None:
            reasons.append("not_null:url")
        if r["url"] is not None and not url_re.match(r["url"]):
            reasons.append("regex:url")
        if r["warc_ts"] is None or not (lo <= r["warc_ts"] <= hi):
            reasons.append("range:warc_ts")
        if r["lang"] is None or r["lang"] not in langs:
            reasons.append("enum:lang")
        out.append(reasons)
    return out


def test_oracle_agreement_on_synth():
    from prompture_ray.synth import gen_partition

    pages, _ = gen_partition(1, 800, seed=42)
    suite = default_webpages_suite()
    row_suite = Suite.from_dict({"meta": {}, "checks": [
        {"id": "url-notnull", "column": "url", "kind": "not_null"},
        {"id": "url-regex", "column": "url", "kind": "regex",
         "pattern": r"^https?://[^ ]+$"},
        {"id": "ts-range", "column": "warc_ts", "kind": "range",
         "min": "2008-01-01T00:00:00", "max": "2026-08-17T00:00:00",
         "nullable": False},
        {"id": "lang-enum", "column": "lang", "kind": "enum",
         "values": list(suite.check("lang-enum").values), "nullable": False},
    ]})
    vb = ValidateBatch(row_suite, key_col="url")
    masks = vb.masks(pages)
    expected = python_oracle(pages.to_pylist(), suite)
    got = {
        "url-notnull": masks["url-notnull"].to_pylist(),
        "url-regex": masks["url-regex"].to_pylist(),
        "ts-range": masks["ts-range"].to_pylist(),
        "lang-enum": masks["lang-enum"].to_pylist(),
    }
    reason_of = {"url-notnull": "not_null:url", "url-regex": "regex:url",
                 "ts-range": "range:warc_ts", "lang-enum": "enum:lang"}
    for i, reasons in enumerate(expected):
        for cid, tag in reason_of.items():
            assert got[cid][i] == (tag not in reasons), \
                f"row {i} check {cid}: engine={got[cid][i]} oracle reasons={reasons}"
