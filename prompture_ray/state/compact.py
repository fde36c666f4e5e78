"""Violation-file compaction.

The fused scan writes one small violation parquet per (batch × partition)
— ideal for idempotent resume, wasteful for long-lived output (thousands
of KB-sized files). Compaction rewrites each completed partition's
directory into a single file, atomically (write tmp → rename → delete
originals), so it can run while the manifest stays authoritative and can
itself be killed and re-run safely.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def compact_partition(vdir: Path) -> dict:
    files = sorted(p for p in vdir.glob("*.parquet")
                   if not p.name.startswith("compacted"))
    if len(files) <= 1:
        return {"dir": str(vdir), "files_in": len(files), "skipped": True}
    table = pa.concat_tables([pq.read_table(f) for f in files])
    tmp = vdir / "compacted.tmp"
    pq.write_table(table, tmp)
    final = vdir / "compacted.parquet"
    tmp.rename(final)          # atomic publish
    for f in files:            # originals removed only after publish
        f.unlink()
    return {"dir": str(vdir), "files_in": len(files),
            "rows": table.num_rows, "skipped": False}


def compact_violations(out_dir: str | Path, use_ray: bool | None = None) -> dict:
    """Compact every pid=* violation directory under <out_dir>/violations.
    Parallelizes across partitions with Ray tasks when a session is up."""
    vroot = Path(out_dir) / "violations"
    dirs = sorted(d for d in vroot.glob("pid=*") if d.is_dir()) \
        if vroot.exists() else []
    if use_ray is None:
        try:
            import ray
            use_ray = ray.is_initialized()
        except ImportError:
            use_ray = False
    if use_ray and len(dirs) > 4:
        import ray

        @ray.remote(num_cpus=1)
        def _task(d: str) -> dict:
            return compact_partition(Path(d))

        results = ray.get([_task.remote(str(d)) for d in dirs])
    else:
        results = [compact_partition(d) for d in dirs]
    done = [r for r in results if not r.get("skipped")]
    return {"partitions": len(dirs), "compacted": len(done),
            "files_removed": sum(r["files_in"] for r in done)}
