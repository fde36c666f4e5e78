"""ORC / Feather source+sink (sources/columnar.py)."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("fmt", ["orc", "feather"])
def test_sink_source_roundtrip(ray_session, tmp_path, fmt):
    import ray.data as rd
    from prompture_ray.sources import columnar

    write = getattr(columnar, f"write_{fmt}")
    read = getattr(columnar, f"read_{fmt}")
    df = pd.DataFrame({
        "id": np.arange(500, dtype="int64"),
        "s": [f"row {i}" for i in range(500)],
        "x": np.arange(500) / 4.0,
        "flag": (np.arange(500) % 2 == 0),
    })
    out = str(tmp_path / fmt)
    manifest = write(rd.from_pandas(df).repartition(4), out).to_pandas()
    assert manifest["n_records"].sum() == 500
    assert len(manifest) == 4
    back = read(out).to_pandas().sort_values("id").reset_index(drop=True)
    for c in df.columns:
        assert back[c].tolist() == df[c].tolist(), c
    # rerun → identical shard set (content-derived names)
    again = write(rd.from_pandas(df).repartition(4), out).to_pandas()
    assert sorted(again["path"]) == sorted(manifest["path"])


def test_feather_column_pruning(ray_session, tmp_path):
    import ray.data as rd
    from prompture_ray.sources.columnar import read_feather, write_feather

    df = pd.DataFrame({"id": np.arange(50, dtype="int64"),
                       "big": ["x" * 100] * 50})
    out = str(tmp_path / "f")
    write_feather(rd.from_pandas(df), out).materialize()
    back = read_feather(out, columns=["id"]).to_pandas()
    assert list(back.columns) == ["id"]
    assert sorted(back["id"]) == list(range(50))
