"""Distributed EXACT order statistics over an integer column — global
quantiles / k-th smallest WITHOUT a global sort (beyond the reference;
the KLL sketch in functions/sketches.py is the approximate form, and
windows.group_quantiles sorts one frame per group — neither gives an
exact GLOBAL cut at scale).

Algorithm: iterative histogram narrowing (classic distributed
selection). Each round scans the (materialized, narrow) value column
once and builds per-block bincounts over ``n_hist`` equal-width
power-of-two buckets spanning the active range; the driver folds the
small fixed-size arrays while STREAMING (one ``n_hist``-long int64
array held, never rows), locates the bucket containing the target rank,
and recurses into it. Bucket width is a power of two (``(v - lo) >>
shift``) so bucketing is exact int64 arithmetic with no overflow and no
float rounding. Rounds = ceil(bits(range) / log2(n_hist)) — ≤ 5 for
any int64 range at the default 8192 buckets; each round ships
``n_hist × 8`` bytes per block.

Exactness contract (the oracle basis): the rank-``k`` result is the
k-th smallest value counting duplicates (1-based) — exactly SQL's
``row_number() OVER (ORDER BY v) = k``; quantile ranks use the integer
ceil form ``k = ceil(q·n)`` (``quantile_disc`` semantics, the round-3
integer-rank idiom — never float q·n).
"""
from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _fold_histogram(vals, lo: int, hi: int, shift: int,
                    n_buckets: int, weighted: bool = False) -> np.ndarray:
    """One scan: per-block bincounts of ``(v - lo) >> shift`` for rows
    in [lo, hi] (weight-summed when ``weighted``, from column ``w``),
    folded on the driver while streaming."""

    def per_batch(t: pa.Table) -> pa.Table:
        v = t["v"]
        keep = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
        arr = v.filter(keep).to_numpy(zero_copy_only=False)
        if len(arr):
            b = (arr - lo) >> shift
            if weighted:
                # np.bincount(weights=...) sums in float64 — EXACT
                # int64 accumulation instead (the >2^53 lesson)
                w = t["w"].filter(keep).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                h = np.zeros(n_buckets, dtype=np.int64)
                np.add.at(h, b, w)
            else:
                h = np.bincount(b, minlength=n_buckets) \
                    .astype(np.int64)
        else:
            h = np.zeros(n_buckets, dtype=np.int64)
        return pa.table({"h": pa.array([h.tobytes()],
                                       type=pa.binary())})

    acc = np.zeros(n_buckets, dtype=np.int64)
    for blk in vals.map_batches(per_batch, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for buf in blk["h"].to_pylist():
            acc += np.frombuffer(buf, dtype=np.int64)
    return acc


def exact_kth_smallest(vals, k: int, lo: int, hi: int, n: int,
                       n_hist: int = 8192) -> int:
    """k-th smallest (1-based, duplicates counted) of the materialized
    single-column Dataset ``vals`` (column ``v``, int64) whose values
    lie in [lo, hi] with ``n`` rows. Driver memory: one n_hist array."""
    if not (1 <= k <= n):
        raise ValueError(f"rank {k} outside 1..{n}")
    log_nb = max(1, int(n_hist).bit_length() - 1)  # floor log2
    target = k
    while True:
        width = hi - lo + 1
        bits = int(width - 1).bit_length() if width > 1 else 0
        shift = max(0, bits - log_nb)
        n_buckets = -(-width // (1 << shift))
        hist = _fold_histogram(vals, lo, hi, shift, n_buckets)
        cum = np.cumsum(hist)
        b = int(np.searchsorted(cum, target, side="left"))
        below = int(cum[b - 1]) if b else 0
        if shift == 0:
            return lo + b
        target -= below
        lo, hi = lo + (b << shift), min(hi, lo + ((b + 1) << shift) - 1)


def exact_weighted_threshold(ds, key_col: str, weight_col: str,
                             budget: int, n_hist: int = 8192) -> int:
    """Smallest key value ``h*`` such that the total ``weight_col`` of
    all rows with ``key_col <= h*`` reaches ``budget`` — the
    deterministic budget cut of a corpus ("keep hash-priority order
    until ~N tokens"): keep = ``key <= h*``. Exactly SQL's
    ``min(key) WHERE sum(weight) OVER (ORDER BY key) >= budget`` (the
    default RANGE frame sums ALL peers of a tied key, matching the
    bucket fold here). Same histogram-narrowing scan as
    ``exact_kth_smallest`` with exact-int64 weight accumulation;
    weights must be non-negative. Returns the max key when the total
    weight never reaches ``budget`` (everything kept)."""
    from ray.data.aggregate import Max, Min, Sum

    if budget < 1:
        raise ValueError("budget must be >= 1")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": t[key_col].combine_chunks().cast(pa.int64()),
            "w": t[weight_col].combine_chunks().cast(pa.int64())})

    vals = ds.map_batches(proj, batch_format="pyarrow").materialize()
    agg = vals.aggregate(Min("v"), Max("v"), Sum("w"))
    lo, hi = int(agg["min(v)"]), int(agg["max(v)"])
    if int(agg["sum(w)"]) < budget:
        return hi
    log_nb = max(1, int(n_hist).bit_length() - 1)
    target = budget
    while True:
        width = hi - lo + 1
        bits = int(width - 1).bit_length() if width > 1 else 0
        shift = max(0, bits - log_nb)
        n_buckets = -(-width // (1 << shift))
        hist = _fold_histogram(vals, lo, hi, shift, n_buckets,
                               weighted=True)
        cum = np.cumsum(hist)
        b = int(np.searchsorted(cum, target, side="left"))
        below = int(cum[b - 1]) if b else 0
        if shift == 0:
            return lo + b
        target -= below
        lo, hi = lo + (b << shift), min(hi, lo + ((b + 1) << shift) - 1)


def exact_global_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99),
                           n_hist: int = 8192) -> dict:
    """EXACT global quantiles of an integer column: value at rank
    ceil(q·n) (quantile_disc semantics, exact-integer rank). Returns
    ``{q: int}``. The projected column is materialized once and scanned
    a handful of times per quantile; nothing row-sized reaches the
    driver."""
    from ray.data.aggregate import Max, Min

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"v": t[col].combine_chunks().cast(pa.int64())})

    vals = ds.map_batches(proj, batch_format="pyarrow").materialize()
    n = vals.count()
    if n == 0:
        raise ValueError("empty input")
    agg = vals.aggregate(Min("v"), Max("v"))
    lo, hi = int(agg["min(v)"]), int(agg["max(v)"])
    out = {}
    for q in qs:
        fr = Fraction(str(q))
        k = max(1, -(-fr.numerator * n // fr.denominator))
        out[q] = exact_kth_smallest(vals, k, lo, hi, n, n_hist)
    return out
