"""Tar/zip shard ingestion (WebDataset convention): member rows, grouped
samples, gz tars, round-trip with the build_* inverses."""

import numpy as np
import pyarrow as pa

from prompture_ray.sources import archives as ar


def _mk_shard(i: int):
    from prompture_ray.stages.multimodal import synth_bmp
    members = []
    for j in range(3):
        key = f"{i:03d}{j:03d}"
        members.append((f"{key}.bmp", synth_bmp(4 + j, 3, (j, j, j))))
        members.append((f"{key}.txt", f"caption {key}".encode()))
    return members


def test_tar_member_rows_roundtrip(ray_session, tmp_path):
    import ray.data as rd  # noqa: F401
    for gz in (False, True):
        name = "s0.tar.gz" if gz else "s0.tar"
        (tmp_path / name).write_bytes(ar.build_tar(_mk_shard(0), gz=gz))
    out = ar.read_tar_files([str(tmp_path / "s0.tar"),
                             str(tmp_path / "s0.tar.gz")]) \
        .to_pandas().sort_values(["shard", "member"], ignore_index=True)
    assert len(out) == 12            # 6 members x 2 shards
    assert set(out["member"]) == {f"000{j:03d}.{e}" for j in range(3)
                                  for e in ("bmp", "txt")}
    # payloads intact
    row = out[(out["member"] == "000000.txt")].iloc[0]
    assert row["payload"] == b"caption 000000"


def test_tar_grouped_samples(ray_session, tmp_path):
    from prompture_ray.stages.multimodal import decode_image
    (tmp_path / "s1.tar").write_bytes(ar.build_tar(_mk_shard(1)))
    out = ar.read_tar_files([str(tmp_path / "s1.tar")],
                            group_samples=True) \
        .to_pandas().sort_values("key", ignore_index=True)
    assert len(out) == 3
    assert list(out.columns) == ["shard", "key", "bmp", "txt"]
    w, h, c, px = decode_image(out["bmp"].iloc[1])
    assert (w, h) == (5, 3)
    assert out["txt"].iloc[0] == b"caption 001000"


def test_zip_rows_and_samples(ray_session, tmp_path):
    (tmp_path / "s2.zip").write_bytes(ar.build_zip(_mk_shard(2)))
    rows = ar.read_zip_files([str(tmp_path / "s2.zip")]).to_pandas()
    assert len(rows) == 6
    samples = ar.read_zip_files([str(tmp_path / "s2.zip")],
                                group_samples=True).to_pandas()
    assert len(samples) == 3
    assert set(samples.columns) == {"shard", "key", "bmp", "txt"}
