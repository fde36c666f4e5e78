"""Fuzzy dictionary match (edit distance <= 1) — SymSpell-style
deletion-variant blocking with a fully vectorized verify.

Reference analogue: prompture's enum normalization accepts near-miss
values (validate_enum_value's lowercase/strip forgiveness,
prompture/extraction/fields.py) — this generalizes it to true
typo-tolerant matching against a dictionary, the spell-correction /
entity-gazetteer join a crawl pipeline runs per token.

Scale shape: the dictionary (small by definition) expands driver-side
into its deletion variants — ``ray.put`` once as a sorted hash array +
word-index array. Each batch then expands its tokens the same way with
ARROW slice kernels (one vectorized pass per deletion position, never
a Python loop over rows), probes the broadcast array by searchsorted,
and verifies surviving candidates with a vectorized distance<=1 check
(uint32 grid compare: same-length -> exactly one mismatching position;
length±1 -> common-prefix + common-suffix covers the shorter string).
Candidate sets after blocking are tiny (SymSpell guarantee), the map
is stateless, and NOTHING shuffles — output rows stream straight out.

ASCII/BMP note: slicing uses codepoint kernels; identity is exact
string equality (hash-blocked, then verified on the real strings), so
a hash collision can only ADD a candidate that the verify rejects.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_BIG = 1 << 30


def _deletion_variants(word: str) -> list[str]:
    return [word] + [word[:i] + word[i + 1:] for i in range(len(word))]


def _grid(strs: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, zero-padded right."""
    u = np.ascontiguousarray(np.asarray(strs, dtype=f"U{width}"))
    return u.view(np.uint32).reshape(len(strs), width)


def lev_le1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized ``levenshtein(a[i], b[i]) <= 1`` over two object
    arrays of strings."""
    if len(a) == 0:
        return np.zeros(0, dtype=bool)
    la = np.char.str_len(np.asarray(a, dtype="U"))
    lb = np.char.str_len(np.asarray(b, dtype="U"))
    width = max(1, int(max(la.max(), lb.max())))
    ma, mb = _grid(a, width), _grid(b, width)
    eq = ma == mb
    mism = (~eq).sum(axis=1)
    ok_same = (la == lb) & (mism <= 1)
    # prefix length = run of equal cells from the left (padding can't
    # extend it across a length difference: char vs 0 mismatches)
    pref = (np.cumprod(eq, axis=1) > 0).sum(axis=1)
    # suffix length via per-row reversed grids (vectorized gather)
    ar = np.arange(width)
    ja = np.clip(la[:, None] - 1 - ar[None, :], 0, width - 1)
    jb = np.clip(lb[:, None] - 1 - ar[None, :], 0, width - 1)
    ra = np.take_along_axis(ma, ja, axis=1) * (ar[None, :] < la[:, None])
    rb = np.take_along_axis(mb, jb, axis=1) * (ar[None, :] < lb[:, None])
    sfx = (np.cumprod(ra == rb, axis=1) > 0).sum(axis=1)
    short = np.minimum(la, lb)
    ok_diff = (np.abs(la - lb) == 1) & (pref + sfx >= short)
    return ok_same | ok_diff


def fuzzy_dict_match(ds, col: str, id_col: str, words: list[str],
                     max_len: int = 64):
    """Match each row's ``col`` string against ``words`` at edit
    distance <= 1; emit ``(id_col, col, match)`` for matched rows only,
    with ``match`` = the lexicographically smallest qualifying word
    (the deterministic tie-break the SQL oracle can mirror)."""
    import ray
    from prompture_ray.functions.sketches import hash64

    var_strs, var_idx = [], []
    for wi, w in enumerate(sorted(set(words))):
        for v in _deletion_variants(w):
            var_strs.append(v)
            var_idx.append(wi)
    vh = hash64(np.asarray(var_strs, dtype=object)).astype(np.int64)
    order = np.argsort(vh, kind="mergesort")
    dict_words = np.asarray(sorted(set(words)), dtype=object)
    ref = ray.put((vh[order], np.asarray(var_idx, dtype=np.int64)[order],
                   dict_words))

    def match(t: pa.Table) -> pa.Table:
        vhs, vidx, dwords = ray.get(ref)
        tok = t[col]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        n = len(tok)
        if n == 0:
            return pa.table({id_col: t[id_col],
                             col: pa.array([], type=pa.string()),
                             "match": pa.array([], type=pa.string())})
        toks = np.asarray(tok.to_pylist(), dtype=object)
        lens = pc.utf8_length(tok).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # token + its deletion variants, one arrow pass per position
        parts = [(toks, np.arange(n))]
        for i in range(min(int(lens.max()) if n else 0, max_len)):
            m = lens > i
            if not m.any():
                break
            sub = tok.filter(pa.array(m))
            v = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub, 0, i),
                pc.utf8_slice_codeunits(sub, i + 1, _BIG), "")
            parts.append((np.asarray(v.to_pylist(), dtype=object),
                          np.flatnonzero(m)))
        all_v = np.concatenate([p[0] for p in parts])
        all_r = np.concatenate([p[1] for p in parts])
        h = hash64(all_v).astype(np.int64)
        pos = np.searchsorted(vhs, h, side="left")
        end = np.searchsorted(vhs, h, side="right")
        # a variant hash can match several dictionary entries
        reps = (end - pos).astype(np.int64)
        hit = reps > 0
        rows = np.repeat(all_r[hit], reps[hit])
        flat = np.concatenate(
            [np.arange(p, e) for p, e in zip(pos[hit], end[hit])]
        ).astype(np.int64) if hit.any() else np.empty(0, dtype=np.int64)
        widx = vidx[flat]
        # dedupe (row, word) then verify on the true strings
        pair = rows * np.int64(len(dwords)) + widx
        upair = np.unique(pair)
        rows_u = (upair // len(dwords)).astype(np.int64)
        widx_u = (upair % len(dwords)).astype(np.int64)
        ok = lev_le1(toks[rows_u], dwords[widx_u])
        rows_ok, widx_ok = rows_u[ok], widx_u[ok]
        # min word per row: widx is sorted within a row by construction
        # (dict_words sorted; upair ordered) -> first hit per row wins
        first = np.ones(len(rows_ok), dtype=bool)
        first[1:] = rows_ok[1:] != rows_ok[:-1]
        rows_f, widx_f = rows_ok[first], widx_ok[first]
        return pa.table({
            id_col: pc.take(t[id_col], pa.array(rows_f)),
            col: pa.array(toks[rows_f], type=pa.string()),
            "match": pa.array(dwords[widx_f], type=pa.string()),
        })

    return ds.map_batches(match, batch_format="pyarrow")
