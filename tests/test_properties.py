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


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_redaction_idempotent_and_total(s):
    """Redacting already-redacted text changes nothing (no pattern may
    match its own replacement tokens), and redaction never raises."""
    import pyarrow as pa
    from prompture_ray.functions.textfuncs import redact_batch
    once = redact_batch(pa.array([s], type=pa.string())).to_pylist()[0]
    twice = redact_batch(pa.array([once], type=pa.string())).to_pylist()[0]
    assert once == twice


@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=40))
@settings(max_examples=80, deadline=None)
def test_coercion_total_and_flagged(vals):
    """Every coercion target is total over arbitrary string input, and
    used_default is True exactly where a non-null input failed to parse
    (and the default was applied)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from prompture_ray.stages.coerce import coerce_column
    col = pa.array(vals, type=pa.string())
    for target in ("int64", "float64", "bool", "timestamp", "date",
                   "uuid", "string"):
        out, used = coerce_column(col, target)
        assert len(out) == len(used) == len(vals)
        # flagged rows had non-null input
        for v, u in zip(vals, used.to_pylist()):
            if u:
                assert v is not None


@given(st.text(max_size=200), st.integers(1, 6))
@settings(max_examples=80, deadline=None)
def test_chunkers_lossless_or_bounded(s, k):
    """Fixed chunking is exactly lossless; markdown/semantic never raise
    and never invent content beyond separator normalization."""
    from prompture_ray.stages.chunk import (
        chunk_fixed, chunk_markdown, chunk_semantic)
    fixed = chunk_fixed(s, size=k * 3, overlap=0)
    assert "".join(fixed) == s
    from prompture_ray.stages.chunk import _MD_HEADER_RE
    for c in chunk_markdown(s):
        assert c
        # no chunk BEGINS with a header line (headers delimit);
        # "#text" without a space is content per CommonMark
        assert not _MD_HEADER_RE.match(c.splitlines()[0])
    chunk_semantic(s)    # total


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_marker_scoring_total_and_bounded(s):
    from prompture_ray.functions.marker_scoring import (
        InjectionScorer, RefusalScorer)
    for scorer in (RefusalScorer(), InjectionScorer()):
        flag, conf, cat, pos = scorer.score_one(s)
        assert 0.0 <= conf <= 1.0
        assert (cat is None) == (conf == 0.0) or cat == "empty"


@given(st.text(max_size=120))
@settings(max_examples=100, deadline=None)
def test_json_schema_validator_total(s):
    """The compiled validator never raises on arbitrary (possibly
    invalid) JSON strings."""
    import pyarrow as pa
    from prompture_ray.stages.json_schema import validate_json_strings
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}
    ok, nerr, first = validate_json_strings(
        pa.array([s], type=pa.string()), schema)
    assert len(ok) == 1


# ---- round-3 operators ----------------------------------------------------

@given(st.lists(st.tuples(
    st.integers(-10**9, 10**9),
    st.text(st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=20),
    st.none() | st.floats(allow_nan=False, allow_infinity=False,
                          width=64),
    st.none() | st.booleans()), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_toon_roundtrip_property(rows):
    """TOON encode→decode is the identity for any uniform records —
    quoting must protect every string, including ones that look like
    numbers/booleans/null or contain delimiters."""
    import pyarrow as pa
    from prompture_ray.pipelines.formats import (
        toon_encode_table, toon_decode)
    t = pa.table({
        "i": pa.array([r[0] for r in rows], type=pa.int64()),
        "s": pa.array([r[1] for r in rows], type=pa.string()),
        "f": pa.array([r[2] for r in rows], type=pa.float64()),
        "b": pa.array([r[3] for r in rows], type=pa.bool_()),
    })
    key, recs = toon_decode(toon_encode_table(t, key="k"))
    assert key == "k"
    assert len(recs) == len(rows)
    for rec, (i, s, f, b) in zip(recs, rows):
        assert rec["i"] == i
        # \r\n in source strings round-trips as \n inside quoted cells?
        # No: toon_encode quotes them via json.dumps, so exact equality
        assert rec["s"] == s
        assert rec["f"] == f
        assert rec["b"] == b


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_citations_total_and_clean(text):
    """Citation parse never raises; clean_text carries no [n] markers."""
    import re
    from prompture_ray.stages.citations import parse_citations
    cites, clean = parse_citations(text)
    assert re.search(r"\[\d+(?:\s*,\s*\d+)*\]", clean) is None
    for c in cites:
        assert text[c["start"]:c["end"]].endswith(c["marker"])


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_strip_markdown_total_deterministic(text):
    from prompture_ray.functions.extract_markdown import (
        strip_markdown, extract_frontmatter)
    assert strip_markdown(text) == strip_markdown(text)
    extract_frontmatter(text)            # must not raise


@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=50,
                unique=True),
       st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=100, deadline=None)
def test_sample_mask_deterministic_and_monotone(ids, frac):
    """Same ids → same mask; a larger fraction keeps a superset."""
    from prompture_ray.stages.sampling import _keep_mask
    ids = np.asarray(ids)
    m1 = _keep_mask(ids, np.full(len(ids), frac))
    m2 = _keep_mask(ids, np.full(len(ids), frac))
    assert (m1 == m2).all()
    bigger = _keep_mask(ids, np.full(len(ids), min(1.0, frac + 0.3)))
    assert (bigger | ~m1).all()          # kept ⊆ kept-at-higher-fraction


@given(st.lists(st.integers(0, 5000), min_size=0, max_size=30),
       st.lists(st.integers(0, 5000), min_size=1, max_size=10),
       st.integers(1, 500))
@settings(max_examples=100, deadline=None)
def test_interval_containment_formula(starts, ts, length):
    """The contiguous-run searchsorted formula used by
    broadcast_interval_join equals brute force for any inputs."""
    starts_arr = np.sort(np.asarray(starts, dtype=np.int64))
    for t in ts:
        lo = np.searchsorted(starts_arr, t - length, side="right")
        hi = np.searchsorted(starts_arr, t, side="right")
        got = set(starts_arr[lo:hi].tolist())
        want = {s for s in starts if s <= t < s + length}
        # multiset subtlety: duplicates collapse in the set compare, but
        # counts must also match
        assert got == want
        assert hi - lo == sum(1 for s in starts if s <= t < s + length)


# ---------------------------------------------------------------------------
# codec round-trip properties (round 4: PNG / GIF lossless, JPEG bounded)
# ---------------------------------------------------------------------------

@given(st.integers(1, 12), st.integers(1, 12),
       st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_lossless(w, h, nch, seed):
    from prompture_ray.stages.multimodal import encode_png, decode_png
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, nch)).astype(np.uint8)
    dw, dh, dc, out = decode_png(encode_png(px))
    assert (dw, dh, dc) == (w, h, nch)
    assert (out == px).all()


@given(st.integers(1, 15), st.integers(1, 15),
       st.sampled_from([2, 4, 8, 16]), st.booleans(),
       st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_lossless(w, h, npal, interlace, seed):
    from prompture_ray.stages.gif import encode_gif, decode_gif
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, npal, size=(h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(npal, 3)).astype(np.uint8)
    dw, dh, frames = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert (dw, dh) == (w, h)
    assert (frames[0] == pal[idx]).all()


@given(st.integers(1, 20), st.integers(1, 20),
       st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_jpeg_gray_q1_roundtrip_bounded(w, h, seed):
    from prompture_ray.stages.jpeg import encode_jpeg, decode_jpeg
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    dw, dh, dc, out = decode_jpeg(
        encode_jpeg(img, quant=np.ones(64, dtype=np.int64)))
    assert (dw, dh, dc) == (w, h, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1


@given(st.integers(1, 6), st.integers(1, 6), st.integers(1, 5),
       st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_avi_roundtrip_lossless(w, h, nframes, seed):
    from prompture_ray.stages.multimodal import build_avi, decode_avi
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
              for _ in range(nframes)]
    dw, dh, _fps, out = decode_avi(build_avi(frames, fps=10))
    assert (dw, dh, len(out)) == (w, h, nframes)
    for a, b in zip(frames, out):
        assert (a == b).all()
