"""interval_coverage / gap_fill (stages/intervals.py) — semantics pinned
against brute-force Python references."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_coverage(rows):
    """rows: (key, s, e). Union of [s,e) per key, e>s only."""
    out = {}
    per = {}
    for k, s, e in rows:
        if e > s:
            per.setdefault(k, []).append((s, e))
    for k, iv in per.items():
        iv.sort()
        islands = []
        for s, e in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        out[k] = (len(iv), len(islands),
                  sum(e - s for s, e in islands))
    return out


def _run_coverage(ray_session, rows, key_type=pa.int64()):
    import ray.data as rd
    from prompture_ray.stages.intervals import interval_coverage
    t = pa.table({
        "k": pa.array([r[0] for r in rows], type=key_type),
        "s": pa.array([r[1] for r in rows], type=pa.int64()),
        "e": pa.array([r[2] for r in rows], type=pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    got = interval_coverage(ds, "k", "s", "e", n_parts=4).to_pandas()
    return {r.k: (r.n_intervals, r.n_islands, r.covered)
            for r in got.itertuples()}


def test_coverage_islands(ray_session):
    rows = [
        (1, 0, 10), (1, 5, 20), (1, 20, 25),   # touching merges -> 1 island
        (1, 30, 40),                            # gap -> 2nd island
        (2, 0, 100), (2, 10, 20),               # contained
        (3, 7, 7), (3, 9, 5),                   # dropped (e <= s)
        (3, 1, 2),
    ]
    got = _run_coverage(ray_session, rows)
    assert got == _brute_coverage(rows)
    assert got[1] == (4, 2, 35)
    assert got[2] == (2, 1, 100)
    assert got[3] == (1, 1, 1)


def test_coverage_random_matches_brute(ray_session):
    rng = np.random.default_rng(7)
    rows = [(int(rng.integers(0, 40)), int(s), int(s + rng.integers(-2, 30)))
            for s in rng.integers(0, 500, size=2000)]
    got = _run_coverage(ray_session, rows)
    assert got == _brute_coverage(rows)


def test_coverage_string_keys(ray_session):
    rows = [("a", 0, 5), ("a", 10, 12), ("b", 3, 4)]
    got = _run_coverage(ray_session, rows, key_type=pa.string())
    assert got == {"a": (2, 2, 7), "b": (1, 1, 1)}


def test_gap_fill_dense(ray_session):
    import ray.data as rd
    from prompture_ray.stages.intervals import gap_fill
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "h": pa.array([10, 10, 14, 3, 3], type=pa.int64())})
    ds = rd.from_arrow(t).repartition(2)
    got = gap_fill(ds, "k", "h", n_parts=4).to_pandas() \
        .sort_values(["k", "h"]).reset_index(drop=True)
    exp = pd.DataFrame({
        "k": [1, 1, 1, 1, 1, 2],
        "h": [10, 11, 12, 13, 14, 3],
        "n": [2, 0, 0, 0, 1, 2]})
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_gap_fill_max_steps_guard(ray_session):
    import ray.data as rd
    from prompture_ray.stages.intervals import gap_fill
    t = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                  "h": pa.array([0, 10_000], type=pa.int64())})
    ds = gap_fill(rd.from_arrow(t), "k", "h", n_parts=2, max_steps=100)
    with pytest.raises(Exception, match="max_steps"):
        ds.materialize()


def test_gap_fill_random_matches_brute(ray_session):
    import ray.data as rd
    from prompture_ray.stages.intervals import gap_fill
    rng = np.random.default_rng(11)
    k = rng.integers(0, 25, size=3000)
    h = rng.integers(0, 60, size=3000)
    t = pa.table({"k": pa.array(k, type=pa.int64()),
                  "h": pa.array(h, type=pa.int64())})
    got = gap_fill(rd.from_arrow(t).repartition(5), "k", "h",
                   n_parts=4).to_pandas()
    df = pd.DataFrame({"k": k, "h": h})
    pieces = []
    for kk, sub in df.groupby("k"):
        grid = np.arange(sub["h"].min(), sub["h"].max() + 1)
        cnt = sub.groupby("h").size().reindex(grid, fill_value=0)
        pieces.append(pd.DataFrame({"k": kk, "h": grid,
                                    "n": cnt.to_numpy()}))
    exp = pd.concat(pieces, ignore_index=True)
    got = got.sort_values(["k", "h"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "h"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))
