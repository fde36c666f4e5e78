"""ROLLUP aggregation: hand-checked levels + pandas-groundtruth equality
under adversarial block layouts (stages/rollup.py)."""

import numpy as np
import pandas as pd


def _mk(df: pd.DataFrame, parts: int):
    import ray.data as rd
    return rd.from_pandas(df).repartition(parts)


def _run(df: pd.DataFrame, dims, parts: int) -> pd.DataFrame:
    from prompture_ray.stages.rollup import rollup_aggregate
    out = rollup_aggregate(_mk(df, parts), dims, "v").to_pandas()
    return out.sort_values(dims, ignore_index=True)


def _truth(df: pd.DataFrame, dims) -> pd.DataFrame:
    from prompture_ray.stages.rollup import ALL
    outs = []
    for lvl in range(len(dims), -1, -1):
        keys = dims[:lvl]
        d = df.copy()
        for c in dims:
            d[c] = d[c].astype(str)
        if keys:
            g = d.groupby(keys, sort=False)["v"] \
                .agg(total="sum", n="count").reset_index()
        else:
            g = pd.DataFrame({"total": [d["v"].sum()], "n": [len(d)]})
        for c in dims[lvl:]:
            g[c] = ALL
        outs.append(g[dims + ["total", "n"]])
    t = pd.concat(outs, ignore_index=True)
    t["total"] = t["total"].astype("int64")
    t["n"] = t["n"].astype("int64")
    return t.sort_values(dims, ignore_index=True)


def test_hand_values(ray_session):
    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": [1, 2, 1, 1, 2],
        "v": np.array([10, 20, 1, 2, 4], dtype="int64"),
    })
    out = _run(df, ["a", "b"], 3)
    # levels: (a,b) -> 4 rows, (a) -> 2 rows, () -> 1 row
    assert len(out) == 7
    row = out[(out["a"] == "x") & (out["b"] == "__all__")].iloc[0]
    assert row["total"] == 30 and row["n"] == 2
    row = out[(out["a"] == "y") & (out["b"] == "1")].iloc[0]
    assert row["total"] == 3 and row["n"] == 2
    top = out[(out["a"] == "__all__") & (out["b"] == "__all__")].iloc[0]
    assert top["total"] == 37 and top["n"] == 5


def test_matches_pandas_any_layout(ray_session):
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "a": rng.choice(["p", "q", "r"], n),
        "b": rng.integers(0, 5, n),
        "v": rng.integers(-50, 200, n).astype("int64"),
    })
    truth = _truth(df, ["a", "b"])
    for parts in (1, 4, 17):
        got = _run(df, ["a", "b"], parts)
        pd.testing.assert_frame_equal(got, truth)


def test_cube_all_subsets(ray_session):
    from prompture_ray.stages.rollup import cube_aggregate, ALL
    rng = np.random.default_rng(3)
    n = 1500
    df = pd.DataFrame({
        "a": rng.choice(["p", "q"], n),
        "b": rng.integers(0, 3, n),
        "v": rng.integers(0, 100, n).astype("int64"),
    })
    out = cube_aggregate(_mk(df, 5), ["a", "b"], "v").to_pandas() \
        .sort_values(["a", "b"], ignore_index=True)
    # 4 grouping sets: (a,b) 6 rows + (a) 2 + (b) 3 + () 1 = 12
    assert len(out) == 12
    d = df.copy()
    d["b"] = d["b"].astype(str)
    # the CUBE-only set (b alone) must match pandas
    byb = d.groupby("b")["v"].sum()
    for b_val, total in byb.items():
        row = out[(out["a"] == ALL) & (out["b"] == b_val)].iloc[0]
        assert row["total"] == total
    top = out[(out["a"] == ALL) & (out["b"] == ALL)].iloc[0]
    assert top["total"] == d["v"].sum() and top["n"] == n


def test_single_dim_and_negative_sums(ray_session):
    df = pd.DataFrame({"a": ["u"] * 4 + ["w"],
                       "v": np.array([-5, -5, 3, 0, 9], dtype="int64")})
    out = _run(df, ["a"], 2)
    assert len(out) == 3
    assert out.set_index("a").loc["u", "total"] == -7
    assert out.set_index("a").loc["__all__", "n"] == 5
