"""CDC merge (stages/cdc.py): latest-change-wins with delete filtering,
cross-block boundaries, string keys."""

import numpy as np
import pandas as pd
import pytest


def _base(n=100):
    return pd.DataFrame({"key": np.arange(n, dtype="int64"),
                         "text": [f"v0 of {i}" for i in range(n)]})


def test_insert_update_delete(ray_session):
    import ray.data as rd
    from prompture_ray.stages.cdc import apply_changes

    base = rd.from_pandas(_base()).repartition(5)
    deltas = pd.DataFrame([
        # two updates to key 7 — seq 2 must win
        {"key": 7, "text": "v1 of 7", "seq": 1, "op": "U"},
        {"key": 7, "text": "v2 of 7", "seq": 2, "op": "U"},
        # delete key 3
        {"key": 3, "text": "", "seq": 1, "op": "D"},
        # delete then re-insert key 4 — re-insert wins
        {"key": 4, "text": "", "seq": 1, "op": "D"},
        {"key": 4, "text": "reborn 4", "seq": 2, "op": "I"},
        # brand-new key
        {"key": 1000, "text": "new 1000", "seq": 1, "op": "I"},
    ])
    out = apply_changes(base, rd.from_pandas(deltas).repartition(3),
                        "key", "seq").to_pandas() \
        .sort_values("key").reset_index(drop=True)
    assert len(out) == 100 - 1 + 1           # -deleted 3, +inserted 1000
    m = dict(zip(out["key"], out["text"]))
    assert 3 not in m
    assert m[7] == "v2 of 7"
    assert m[4] == "reborn 4"
    assert m[1000] == "new 1000"
    assert m[50] == "v0 of 50"
    assert set(out.columns) == {"key", "text"}


def test_keep_meta_and_block_boundaries(ray_session):
    """One hot key updated many times across many blocks: only the
    highest seq survives (boundary drop-set correctness)."""
    import ray.data as rd
    from prompture_ray.stages.cdc import apply_changes

    base = rd.from_pandas(_base(10)).repartition(2)
    # 500 updates to key 5 spread over many partitions
    deltas = pd.DataFrame({"key": 5, "text": [f"u{s}" for s in range(1, 501)],
                           "seq": np.arange(1, 501, dtype="int64"),
                           "op": "U"})
    out = apply_changes(base, rd.from_pandas(deltas).repartition(20),
                        "key", "seq", keep_meta=True).to_pandas()
    row = out[out["key"] == 5]
    assert len(row) == 1
    assert row["text"].iloc[0] == "u500"
    assert row["seq"].iloc[0] == 500
    assert len(out) == 10


def test_string_keys(ray_session):
    import ray.data as rd
    from prompture_ray.stages.cdc import apply_changes

    base = rd.from_pandas(pd.DataFrame({
        "url": [f"https://ex.com/{i}" for i in range(20)],
        "text": [f"v0 {i}" for i in range(20)]}))
    deltas = pd.DataFrame([
        {"url": "https://ex.com/5", "text": "new 5", "seq": 1, "op": "U"},
        {"url": "https://ex.com/6", "text": "", "seq": 1, "op": "D"},
    ])
    out = apply_changes(base, rd.from_pandas(deltas), "url", "seq") \
        .to_pandas()
    m = dict(zip(out["url"], out["text"]))
    assert m["https://ex.com/5"] == "new 5"
    assert "https://ex.com/6" not in m
    assert len(out) == 19
