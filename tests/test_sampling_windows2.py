"""Hopping windows, deterministic sampling, exact group quantiles."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_hopping_window(ray_session):
    import ray.data as rd
    from prompture_ray.stages.windows import hopping_window
    ts = pd.to_datetime([
        "2024-01-01 00:10", "2024-01-01 00:50",   # hour 0
        "2024-01-01 01:30",                        # hour 1
        "2024-01-01 03:05",                        # hour 3
    ])
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "k": pa.array(["a"] * 4),
        "v": pa.array([1.0, 2.0, 4.0, 8.0]),
    }))
    out = hopping_window(ds, "ts", ["k"], window="2h", hop="1h",
                         agg_col="v").to_pandas()
    got = {(r["window_start"].hour - 24 * (r["window_start"].day - 1)
            if False else r["window_start"].isoformat()): (r["n"], r["sum_v"])
           for _, r in out.iterrows()}
    # window starting 23:00 of prev day covers hour-0 events too
    assert got["2023-12-31T23:00:00"] == (2, 3.0)
    assert got["2024-01-01T00:00:00"] == (3, 7.0)   # hours 0+1
    assert got["2024-01-01T01:00:00"] == (1, 4.0)
    assert got["2024-01-01T02:00:00"] == (1, 8.0)   # hour-3 event, 2h window
    assert got["2024-01-01T03:00:00"] == (1, 8.0)
    assert len(got) == 5


def test_deterministic_and_stratified_sample(ray_session):
    import ray.data as rd
    from prompture_ray.stages.sampling import (
        deterministic_sample, stratified_sample, _keep_mask)
    n = 4000
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(n), type=pa.int64()),
        "s": pa.array(["a" if i % 2 else "b" for i in range(n)]),
    }))
    kept = deterministic_sample(ds, "id", 0.3).to_pandas()
    # deterministic: same ids every run, fraction approximately honored
    kept2 = deterministic_sample(ds.repartition(7), "id", 0.3).to_pandas()
    assert sorted(kept["id"]) == sorted(kept2["id"])
    assert 0.25 < len(kept) / n < 0.35
    strat = stratified_sample(ds, "id", "s", {"a": 0.1}, default=0.9) \
        .to_pandas()
    fa = (strat["s"] == "a").sum() / (n / 2)
    fb = (strat["s"] == "b").sum() / (n / 2)
    assert 0.05 < fa < 0.15 and 0.85 < fb < 0.95
    # the keep rule is the documented closed form
    ids = np.arange(n)
    mask = _keep_mask(ids, np.full(n, 0.3))
    assert sorted(ids[mask]) == sorted(kept["id"])


def test_group_quantiles_exact(ray_session):
    import ray.data as rd
    from prompture_ray.stages.windows import group_quantiles
    vals = list(range(1, 101))          # 1..100
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["g"] * 100),
        "v": pa.array([float(x) for x in vals]),
    }))
    out = group_quantiles(ds, "k", "v", (0.5, 0.9, 0.99)).to_pandas()
    assert out.iloc[0]["q5"] == 50.0     # ceil(0.5*100)-1 = index 49
    assert out.iloc[0]["q9"] == 90.0
    assert out.iloc[0]["q99"] == 99.0


def test_assign_splits_deterministic_and_grouped(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.stages.sampling import assign_splits
    ids = np.arange(1000, dtype=np.int64)
    t = pa.table({"id": ids, "grp": ids // 7})
    ds = rd.from_arrow(t)
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = assign_splits(assign_splits(ds, "id", splits),
                        "grp", splits, out_col="gsplit").to_pandas() \
        .sort_values("id", ignore_index=True)
    # fractions roughly honored
    frac = out["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    # every row of a group shares the group split (leakage-safe)
    assert (out.groupby("grp")["gsplit"].nunique() == 1).all()
    # reproducible under a different block layout
    out2 = assign_splits(rd.from_arrow(t).repartition(7), "id",
                         splits).to_pandas().sort_values("id",
                                                         ignore_index=True)
    assert out["split"].tolist() == out2["split"].tolist()
    # fractions must sum to 1
    import pytest
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(ds, "id", [("a", 0.5)])
