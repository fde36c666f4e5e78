"""Distributed exact order statistics (stages/selection.py): parity
with a plain sort at every rank, duplicates, negatives, narrow-range
and single-value inputs, multi-round narrowing (tiny n_hist)."""
import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.stages.selection import (exact_global_quantiles,
                                            exact_kth_smallest)


def _vals(arr, parallelism=3):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "v": pa.array(arr, type=pa.int64())})) \
        .repartition(parallelism).materialize()


def test_every_rank_matches_sort(ray_session):
    rng = np.random.RandomState(7)
    arr = rng.randint(-500, 500, size=101).astype(np.int64)
    arr[10:20] = arr[0]  # duplicates
    vals = _vals(arr.tolist())
    s = np.sort(arr)
    lo, hi, n = int(s[0]), int(s[-1]), len(s)
    # small n_hist forces several narrowing rounds
    for k in [1, 2, 50, 100, 101]:
        assert exact_kth_smallest(vals, k, lo, hi, n,
                                  n_hist=8) == int(s[k - 1])


def test_quantiles_match_integer_rank(ray_session):
    import ray.data as rd
    arr = list(range(1, 11))  # 1..10
    ds = rd.from_arrow(pa.table({"x": pa.array(arr, type=pa.int64())}))
    out = exact_global_quantiles(ds, "x", qs=(0.5, 0.8, 0.9, 0.99),
                                 n_hist=4)
    # ceil(q*10): 5, 8, 9, 10
    assert out == {0.5: 5, 0.8: 8, 0.9: 9, 0.99: 10}


def test_single_value_and_bad_rank(ray_session):
    vals = _vals([42, 42, 42], parallelism=1)
    assert exact_kth_smallest(vals, 2, 42, 42, 3) == 42
    with pytest.raises(ValueError):
        exact_kth_smallest(vals, 4, 42, 42, 3)


def test_negative_wide_range(ray_session):
    arr = [-(2 ** 40), -17, 0, 3, 2 ** 45]
    vals = _vals(arr, parallelism=2)
    for k, want in enumerate(sorted(arr), start=1):
        assert exact_kth_smallest(vals, k, min(arr), max(arr),
                                  len(arr), n_hist=16) == want


def test_weighted_threshold_hand_checked(ray_session):
    import ray.data as rd
    from prompture_ray.stages.selection import exact_weighted_threshold
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 10], type=pa.int64()),
        "w": pa.array([5, 1, 1, 4, 7], type=pa.int64())})) \
        .repartition(2)
    # cum by key (ties fold together): 1->5, 2->7, 3->11, 10->18
    cases = {1: 1, 5: 1, 6: 2, 7: 2, 8: 3, 11: 3, 12: 10, 18: 10,
             19: 10}  # 19 > total -> everything kept (max key)
    for budget, want in cases.items():
        assert exact_weighted_threshold(ds, "k", "w", budget,
                                        n_hist=4) == want
    with pytest.raises(ValueError):
        exact_weighted_threshold(ds, "k", "w", 0)


def test_forward_fill(ray_session):
    import ray.data as rd
    from prompture_ray.stages.analytic import forward_fill
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([10, 20, 30, 40, 10, 20], type=pa.int64()),
        "tie": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        # leading null stays; later nulls carry forward PER KEY
        "v": pa.array([None, 7, None, None, None, 9],
                      type=pa.int64()),
        "big": pa.array([2**62 + 1, None, None, 5, None, None],
                        type=pa.int64())})
    df = forward_fill(rd.from_arrow(t).repartition(3), "k", "ts",
                      "tie", ["v", "big"]).to_pandas() \
        .sort_values(["k", "ts"], ignore_index=True)
    import pandas as pd

    def vals(col):
        return [None if pd.isna(x) else int(x) for x in df[col]]

    assert vals("v") == [None, 7, 7, 7, None, 9]
    # hash-magnitude int64 survives exactly (no float64 widening)
    assert vals("big") == [2**62 + 1, 2**62 + 1, 2**62 + 1, 5,
                           None, None]
