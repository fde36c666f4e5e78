"""Violation compaction: atomic, idempotent, content-preserving."""

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from prompture_ray.state.compact import compact_partition, compact_violations


def _mk(vdir: Path, n_files: int = 4, rows_per: int = 5):
    vdir.mkdir(parents=True)
    for i in range(n_files):
        pq.write_table(pa.table({
            "check_id": [f"c{i}"] * rows_per,
            "row_key": [f"k{i}-{j}" for j in range(rows_per)],
        }), vdir / f"{i:04d}.parquet")


def test_compact_partition_preserves_rows(tmp_path):
    vdir = tmp_path / "violations" / "pid=0"
    _mk(vdir)
    r = compact_partition(vdir)
    assert r["files_in"] == 4 and r["rows"] == 20
    files = list(vdir.glob("*.parquet"))
    assert [f.name for f in files] == ["compacted.parquet"]
    t = pq.read_table(files[0])
    assert t.num_rows == 20
    assert len(set(t["row_key"].to_pylist())) == 20
    # idempotent: second run is a no-op
    r2 = compact_partition(vdir)
    assert r2["skipped"]


def test_compact_violations_tree(tmp_path):
    for pid in range(3):
        _mk(tmp_path / "violations" / f"pid={pid}", n_files=2 + pid)
    out = compact_violations(tmp_path, use_ray=False)
    assert out == {"partitions": 3, "compacted": 3, "files_removed": 9}
    for pid in range(3):
        files = list((tmp_path / "violations" / f"pid={pid}").glob("*"))
        assert [f.name for f in files] == ["compacted.parquet"]


def test_compact_missing_dir(tmp_path):
    assert compact_violations(tmp_path, use_ray=False) == {
        "partitions": 0, "compacted": 0, "files_removed": 0}
