"""Analytic window functions: plain vs bucketed equality + hand-checked
values (stages/analytic.py)."""

import numpy as np
import pandas as pd
import pytest


def _mk(ds_rows: pd.DataFrame):
    import ray.data as rd
    return rd.from_pandas(ds_rows).repartition(7)


def test_plain_hand_values(ray_session):
    from prompture_ray.stages.analytic import analytic_window
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "ts": pd.to_datetime([10, 20, 30, 40, 5], unit="s"),
        "tie": [0, 1, 2, 3, 4],
        "v": np.array([5, 7, -2, 10, 3], dtype="int64"),
    })
    out = analytic_window(_mk(df), "k", ["ts", "tie"], "v", window=3) \
        .to_pandas().sort_values(["k", "tie"]).reset_index(drop=True)
    assert out["rn"].tolist() == [1, 2, 3, 4, 1]
    # lag/lead
    lag = out["lag_v"].tolist()
    assert np.isnan(lag[0]) and lag[1:4] == [5, 7, -2] and np.isnan(lag[4])
    lead = out["lead_v"].tolist()
    assert lead[0:3] == [7, -2, 10] and np.isnan(lead[3]) and np.isnan(lead[4])
    # rolling sums over last 3 rows
    assert out["msum"].tolist() == [5, 12, 10, 15, 3]
    assert out["mavg"].tolist() == [5.0, 6.0, 10 / 3, 5.0, 3.0]


def test_bucketed_equals_plain_hot_and_sparse(ray_session):
    from prompture_ray.stages.analytic import (analytic_window,
                                               analytic_window_bucketed)
    rng = np.random.default_rng(42)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n),            # hot keys, many per day
        "ts": pd.to_datetime(rng.integers(0, 15 * 86400, n), unit="s"),
        "tie": np.arange(n),
        "v": rng.integers(-100, 500, n).astype("int64"),
    })
    # sparse key: one event every 3 days → every (key, day) cell has a
    # single row, so lag/lead AND the rolling tail all cross cells
    sparse = pd.DataFrame({
        "k": 99,
        "ts": pd.to_datetime(np.arange(8) * 86400 * 3 + 11, unit="s"),
        "tie": np.arange(n, n + 8),
        "v": (np.arange(8, dtype="int64") * 13 - 20),
    })
    df = pd.concat([df, sparse], ignore_index=True)
    ds = _mk(df)
    cols = ["k", "tie", "rn", "lag_v", "lead_v", "msum", "mavg"]
    a = analytic_window(ds, "k", ["ts", "tie"], "v", window=3) \
        .to_pandas()[cols].sort_values(["k", "tie"]).reset_index(drop=True)
    b = analytic_window_bucketed(ds, "k", "ts", "tie", "v", window=3) \
        .to_pandas()[cols].sort_values(["k", "tie"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_bucketed_window_wider_than_cells(ray_session):
    """window=5 with single-row cells: the patch tail must span FOUR
    preceding cells (carry merging across cells)."""
    from prompture_ray.stages.analytic import (analytic_window,
                                               analytic_window_bucketed)
    df = pd.DataFrame({
        "k": 7,
        "ts": pd.to_datetime(np.arange(12) * 86400 + 3600, unit="s"),
        "tie": np.arange(12),
        "v": np.array([1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048],
                      dtype="int64"),
    })
    ds = _mk(df)
    cols = ["tie", "rn", "lag_v", "lead_v", "msum", "mavg"]
    a = analytic_window(ds, "k", ["ts", "tie"], "v", window=5) \
        .to_pandas()[cols].sort_values("tie").reset_index(drop=True)
    b = analytic_window_bucketed(ds, "k", "ts", "tie", "v", window=5) \
        .to_pandas()[cols].sort_values("tie").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # geometric values make window sums unambiguous: sum of last 5
    assert b["msum"].tolist()[5] == 2 + 4 + 8 + 16 + 32


def test_window_must_be_at_least_two(ray_session):
    from prompture_ray.stages.analytic import analytic_window_bucketed
    df = pd.DataFrame({"k": [1], "ts": pd.to_datetime([0], unit="s"),
                       "tie": [0], "v": np.array([1], dtype="int64")})
    with pytest.raises(AssertionError):
        analytic_window_bucketed(_mk(df), "k", "ts", "tie", "v", window=1)


def test_top_k_per_group_matches_pandas(ray_session):
    from prompture_ray.stages.analytic import top_k_per_group
    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame({
        "key": rng.choice(["a", "b", "c", "d"], n),
        "score": rng.integers(0, 40, n).astype("int64"),  # many ties
        "id": np.arange(n, dtype="int64"),
    })
    cols = ["key", "score", "id", "rk"]
    truth = df.sort_values(["key", "score", "id"],
                           ascending=[True, False, True],
                           kind="mergesort")
    truth = truth.groupby("key", sort=False).head(5).copy()
    truth["rk"] = (truth.groupby("key", sort=False).cumcount() + 1) \
        .astype("int64")
    truth = truth[cols].sort_values(["key", "rk"], ignore_index=True)
    for parts in (1, 11):
        out = top_k_per_group(_mk(df).repartition(parts), "key", "score",
                              k=5, tie_col="id").to_pandas()[cols] \
            .sort_values(["key", "rk"], ignore_index=True)
        pd.testing.assert_frame_equal(out, truth)


def test_top_k_small_groups(ray_session):
    from prompture_ray.stages.analytic import top_k_per_group
    df = pd.DataFrame({"key": ["x", "x", "y"],
                       "score": np.array([1, 2, 9], dtype="int64"),
                       "id": np.array([0, 1, 2], dtype="int64")})
    out = top_k_per_group(_mk(df), "key", "score", k=10,
                          tie_col="id").to_pandas() \
        .sort_values(["key", "rk"], ignore_index=True)
    assert out["id"].tolist() == [1, 0, 2]       # group smaller than k
    assert out["rk"].tolist() == [1, 2, 1]


def test_percent_rank_matches_pandas(ray_session):
    from prompture_ray.stages.analytic import percent_rank_by_key
    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame({
        "key": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 25, n).astype("int64"),   # heavy ties
        "id": np.arange(n, dtype="int64"),
    })
    # one single-row key exercises the n==1 -> 0.0 branch
    df = pd.concat([df, pd.DataFrame({"key": ["solo"], "v": [7],
                                      "id": [n]})], ignore_index=True)
    out = percent_rank_by_key(_mk(df).repartition(9), "key", "v") \
        .to_pandas().sort_values("id", ignore_index=True)
    truth = df.copy()
    truth["pr"] = truth.groupby("key")["v"].rank(method="min") \
        .sub(1).div(truth.groupby("key")["v"].transform("size").sub(1)
                    .clip(lower=1))
    truth.loc[truth.groupby("key")["v"].transform("size") == 1, "pr"] = 0.0
    truth = truth.sort_values("id", ignore_index=True)
    assert np.array_equal(out["pr"].to_numpy(), truth["pr"].to_numpy())


def test_global_row_number(ray_session):
    """zipWithIndex: exact 0..n-1 in key order under a multi-block
    layout with sparse, shuffled ids; payload columns survive."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.stages.analytic import global_row_number

    rng = np.random.default_rng(3)
    ids = rng.choice(50_000_000, 4000, replace=False).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "p": pa.array(ids % 17, type=pa.int64())})).repartition(11)
    out = global_row_number(ds, "doc_id").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert list(out["rownum"]) == list(range(len(ids)))
    assert (out["p"] == out["doc_id"] % 17).all()


# -------------------------------------------------- lag_shift / bursts


def test_lag_shift_hand_values(ray_session):
    from prompture_ray.stages.analytic import lag_shift
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2],
        "ts": np.array([10, 20, 30, 5, 8], dtype="int64"),
        "tie": np.array([0, 1, 2, 3, 4], dtype="int64"),
        "v": np.array([2**62 + 3, 7, -2, 10, 3], dtype="int64"),
        "s": ["a", "b", "c", "d", "e"],
    })
    out = lag_shift(_mk(df), "k", "ts", "tie", ["v", "s"],
                    shifts=(1, -1)) \
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    lag = [None if pd.isna(x) else int(x) for x in out["v_lag1"]]
    # hash-magnitude int64 survives the shift exactly (nullable Int64)
    assert lag == [None, 2**62 + 3, 7, None, 10]
    lead = [None if pd.isna(x) else int(x) for x in out["v_lead1"]]
    assert lead == [7, -2, None, 3, None]
    assert [x if isinstance(x, str) else None
            for x in out["s_lag1"]] == [None, "a", "b", None, "d"]
    with pytest.raises(ValueError):
        lag_shift(_mk(df), "k", "ts", "tie", ["v"], shifts=(0,))


def test_lag_shift_ties_break_on_tie_col(ray_session):
    from prompture_ray.stages.analytic import lag_shift
    df = pd.DataFrame({
        "k": ["x", "x", "x"],
        "ts": np.array([10, 10, 10], dtype="int64"),
        "tie": np.array([2, 0, 1], dtype="int64"),
        "v": np.array([20, 0, 10], dtype="int64")})
    out = lag_shift(_mk(df), "k", "ts", "tie", ["v"]).to_pandas() \
        .sort_values("tie").reset_index(drop=True)
    lag = [None if pd.isna(x) else int(x) for x in out["v_lag1"]]
    assert lag == [None, 0, 10]  # order 0,10,20 by tie


def test_suppress_bursts_hand_values(ray_session):
    from prompture_ray.stages.analytic import suppress_bursts
    # key 1: 0 keep, 5 drop (gap 5 < 10), 15 keep (gap 10 >= 10),
    #        18 drop (gap 3 vs PREVIOUS OCCURRENCE 15)
    # key 2: single row always kept
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "ts": np.array([0, 5, 15, 18, 100], dtype="int64"),
        "tie": np.array([0, 1, 2, 3, 4], dtype="int64")})
    out = suppress_bursts(_mk(df), "k", "ts", "tie", min_gap=10) \
        .to_pandas()
    assert sorted(out["tie"].tolist()) == [0, 2, 4]


def test_pivot_counts_matches_pandas(ray_session):
    from prompture_ray.stages.rollup import pivot_counts
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "key": rng.integers(0, 9, 500),
        "cat": np.array(["a", "b", "c"], dtype=object)[
            rng.integers(0, 3, 500)],
        "w": rng.integers(-3, 9, 500).astype("int64")})
    out = pivot_counts(_mk(df), "key", "cat", ["a", "b"]) \
        .to_pandas().set_index("key").sort_index()
    want = df.pivot_table(index="key", columns="cat", values="w",
                          aggfunc="count", fill_value=0)
    assert (out["n_a"] == want["a"]).all()
    assert (out["n_b"] == want["b"]).all()
    assert "n_c" not in out.columns  # domain is caller-bounded
    # sum mode, exact int64 with negatives
    out2 = pivot_counts(_mk(df), "key", "cat", ["a", "b", "c"],
                        value_col="w").to_pandas() \
        .set_index("key").sort_index()
    want2 = df.pivot_table(index="key", columns="cat", values="w",
                           aggfunc="sum", fill_value=0)
    for c in ["a", "b", "c"]:
        assert (out2[f"n_{c}"] == want2[c]).all()


def test_cusum_matches_bruteforce(ray_session):
    from prompture_ray.stages.analytic import cusum_flags
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 17, n),
        "ts": rng.integers(0, 10**6, n),
        "tie": np.arange(n, dtype="int64"),
        "v": rng.integers(0, 100, n).astype("int64"),
    })
    out = cusum_flags(_mk(df), "k", "ts", "tie", "v",
                      target_k=50, threshold_h=200) \
        .to_pandas().sort_values(["k", "ts", "tie"]) \
        .reset_index(drop=True)
    # brute-force recursive replay
    got = out["cusum"].tolist()
    brute = []
    for k, g in df.sort_values(["k", "ts", "tie"]).groupby("k"):
        s = 0
        for v in g["v"]:
            s = max(0, s + int(v) - 50)
            brute.append(s)
    # out is sorted (k, ts, tie) and groupby("k") iterates sorted keys
    assert got == brute
    assert out["is_shift"].tolist() == [s > 200 for s in brute]


def test_fir_smooth_hand_values(ray_session):
    from prompture_ray.stages.analytic import fir_smooth
    df = pd.DataFrame({
        "k": [1] * 5 + [2] * 2,
        "ts": list(range(5)) + [0, 1],
        "tie": list(range(7)),
        "v": np.array([8, 16, 24, 32, 40, 4, 8], dtype="int64"),
    })
    out = fir_smooth(_mk(df), "k", "ts", "tie", "v", taps=4) \
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    fir = out["fir"].tolist()
    # taps=4 weights: 1/2, 1/4, 1/8, 1/8 — first 3 rows of k=1 null
    assert all(np.isnan(x) for x in fir[:3])
    assert fir[3] == 32 / 2 + 24 / 4 + 16 / 8 + 8 / 8
    assert fir[4] == 40 / 2 + 32 / 4 + 24 / 8 + 16 / 8
    assert all(np.isnan(x) for x in fir[5:])


def test_ntile_matches_standard_fill(ray_session):
    from prompture_ray.stages.analytic import ntile_by_key
    rng = np.random.default_rng(11)
    rows = []
    for k, n in [(1, 10), (2, 7), (3, 3), (4, 1), (5, 4)]:
        vs = rng.permutation(1000 + np.arange(n))
        rows += [(k, int(v)) for v in vs]
    df = pd.DataFrame(rows, columns=["k", "v"])
    out = ntile_by_key(_mk(df), "k", "v", 4) \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)

    def std_ntile(n, k):
        q, r = divmod(n, k)
        tiles = []
        for b in range(1, k + 1):
            tiles += [b] * (q + (1 if b <= r else 0))
        return tiles

    for k, n in [(1, 10), (2, 7), (3, 3), (4, 1), (5, 4)]:
        got = out[out["k"] == k]["tile"].tolist()
        assert got == std_ntile(n, 4), (k, got)


def test_max_drawdown_bruteforce(ray_session):
    from prompture_ray.stages.analytic import max_drawdown_by_key
    rng = np.random.default_rng(23)
    n = 2500
    df = pd.DataFrame({
        "k": rng.integers(0, 13, n),
        "ts": rng.integers(0, 10**6, n),
        "tie": np.arange(n),
        "v": rng.integers(-50, 51, n).astype("int64"),
    })
    out = max_drawdown_by_key(_mk(df), "k", "ts", "tie", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for r in out.itertuples(index=False):
        g = df[df["k"] == r.k].sort_values(["ts", "tie"])
        p = g["v"].cumsum().to_numpy()
        dd = int((np.maximum.accumulate(p) - p).max())
        assert r.max_drawdown == dd and r.n == len(g)


def test_unpivot_hand_values(ray_session):
    from prompture_ray.stages.analytic import unpivot
    df = pd.DataFrame({"id": [1, 2], "x": [10, 20], "y": [3, 4]})
    out = unpivot(_mk(df), ["id"], ["x", "y"]).to_pandas() \
        .sort_values(["id", "variable"]).reset_index(drop=True)
    assert list(map(tuple, out.itertuples(index=False))) == [
        (1, "x", 10), (1, "y", 3), (2, "x", 20), (2, "y", 4)]


def test_longest_streak_bruteforce(ray_session):
    from prompture_ray.stages.analytic import longest_streak
    rng = np.random.default_rng(67)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 15, n),
        "ts": rng.integers(0, 10**6, n),
        "tie": np.arange(n),
        "v": rng.choice(list("abc"), n),
    })
    out = longest_streak(_mk(df), "k", "ts", "tie", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for r in out.itertuples(index=False):
        g = df[df["k"] == r.k].sort_values(["ts", "tie"])
        vs = g["v"].tolist()
        best_len, best_val, cur_len = 0, None, 0
        for i, v in enumerate(vs):
            cur_len = cur_len + 1 if i and vs[i - 1] == v else 1
            if cur_len > best_len:
                best_len, best_val = cur_len, v
        assert r.streak == best_len and r.streak_val == best_val
