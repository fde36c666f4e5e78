"""Property-based tests (hypothesis) — invariants the unit oracles can't
enumerate: repair totality, normalization idempotence, sketch merge
associativity, extraction determinism."""

import json

import numpy as np
from hypothesis import given, settings, strategies as st

from prompture_ray.functions.textfuncs import (
    parse_partial_json, normalize_text,
)
from prompture_ray.functions.extract_html import extract_text
from prompture_ray.functions import sketches as sk

json_values = st.recursive(
    st.none() | st.booleans() | st.integers(-10**6, 10**6)
    | st.text(st.characters(codec="utf-8",
                            exclude_categories=("Cs",)), max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=10)


@given(json_values, st.integers(min_value=0, max_value=200))
@settings(max_examples=150, deadline=None)
def test_parse_partial_json_total_on_prefixes(value, cut):
    """Never raises on any prefix of valid JSON; full input round-trips."""
    s = json.dumps(value)
    parse_partial_json(s[:cut])          # must not raise
    assert parse_partial_json(s) == value


@given(st.text(max_size=200))
@settings(max_examples=150, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_extract_text_total_and_deterministic(b):
    """Extraction never raises on arbitrary bytes and is deterministic."""
    assert extract_text(b) == extract_text(b)


@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=50, deadline=None)
def test_hll_merge_associative(vals, n_parts):
    arr = np.asarray(vals, dtype=object)
    whole = sk.HLL(10)
    whole.update_array(arr)
    parts = [sk.HLL(10) for _ in range(n_parts)]
    for i, p in enumerate(parts):
        chunk = arr[i::n_parts]
        if len(chunk):
            p.update_array(chunk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert np.array_equal(whole.registers, merged.registers)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_kll_quantiles_bounded(vals):
    k = sk.KLL(k=64)
    k.update_array(np.asarray(vals))
    lo, hi = min(vals), max(vals)
    for q in (0.0, 0.5, 1.0):
        est = k.quantile(q)
        assert lo <= est <= hi
