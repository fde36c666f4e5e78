"""The flagship pipeline: suite run over a web_pages Parquet directory.

Execution shape (SURVEY §3.2's runner skeleton, made data-parallel):

    read_parquet(pending fragments, include_paths)          [stream]
      → HtmlExtractor actor pool (only if extract_match)    [stateful]
      → ValidateAndSink map_batches                         [one pass]
            · evaluates every row-level check vectorized
            · writes violation rows → violations/pid=<pid>/ [side sink]
            · accumulates per-batch sketch partials
            · emits ONE small partial row per (batch × fragment)
      → driver folds partial rows STREAMING (iter_batches):
            · sketch merge (associative partial+final reduction)
            · per-fragment row counts → manifest checkpoint record as soon
              as a fragment completes (incremental, resumable)
    + table-level passes on narrow projections (unique / referential)
    + drift scoring vs pinned baseline
    → report.json {meta, results[], stats, drift, run}

Resume: completed fragments (manifest) are skipped entirely; violation
dirs of incomplete partitions are wiped before rerun (idempotent outputs);
metrics always come from manifest records so nothing double-counts.

Scale notes: the one linear scan carries the whole row-level suite; the
only shuffles are the uniqueness groupby and (when the right side is big)
the referential anti-join — both over projected key columns, never over
``html``. Sketch partials are a few hundred KB per block and merge in a
streaming fold; on a real cluster the fold's first level would run as a
``map_batches`` merge stage per partition (the merge is associative), the
driver only folds per-partition results.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from prompture_ray.specs import Suite
from prompture_ray.stages.validate import ValidateBatch
from prompture_ray.stages.stats import (
    StatsAccumulator, load_baseline, score_drift,
)
from prompture_ray.state.checkpoint import Manifest

PARTIAL_SCHEMA = pa.schema([
    pa.field("path", pa.string()),
    pa.field("rows", pa.int64()),
    pa.field("ok_rows", pa.int64()),
    pa.field("viol_json", pa.string()),
    pa.field("sketches", pa.binary()),
    pa.field("elapsed_ms", pa.float64()),
])


class ValidateAndSink:
    """Fused validate + violation-sink + sketch-partial stage.

    Passed as a callable class to ``map_batches`` so spec compilation runs
    once per worker. Violations are written under
    ``violations/pid=<pid>/<uuid>.parquet`` (idempotent by pid: incomplete
    pids are wiped on resume before this stage reruns them).
    """

    def __init__(self, suite: Suite, out_dir: str, key_col: str,
                 path_to_pid: dict[str, int]):
        self.vb = ValidateBatch(suite, key_col=key_col)
        self.stats_checks = [c for c in suite.table_checks if c.kind == "stats"]
        self.out_dir = out_dir
        self.path_to_pid = path_to_pid

    def _process_group(self, batch: pa.Table, path: str) -> dict:
        t0 = time.perf_counter()
        pid = self.path_to_pid.get(path, -1)
        masks = self.vb.masks(batch)
        ok, _ = self.vb.verdict_columns(batch, masks)
        viol = self.vb.violations(batch, masks)
        if viol.num_rows:
            vdir = Path(self.out_dir) / "violations" / f"pid={pid}"
            vdir.mkdir(parents=True, exist_ok=True)
            viol = viol.append_column(
                "partition_id", pa.array([pid] * viol.num_rows, type=pa.int32()))
            pq.write_table(viol, vdir / f"{uuid.uuid4().hex}.parquet")
        acc = StatsAccumulator(self.stats_checks)
        acc.update(batch)
        reasons = viol["reason"].to_pylist()
        by_reason: dict[str, int] = {}
        for r in reasons:
            by_reason[r] = by_reason.get(r, 0) + 1
        return {
            "path": path,
            "rows": batch.num_rows,
            "ok_rows": int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0),
            "viol_json": json.dumps(by_reason, sort_keys=True),
            "sketches": acc.dumps(),
            "elapsed_ms": (time.perf_counter() - t0) * 1e3,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        paths = batch["path"]
        data = batch.drop_columns(["path"])
        uniq = pc.unique(paths).to_pylist()
        rows = []
        if len(uniq) == 1:
            rows.append(self._process_group(data, uniq[0]))
        else:
            # a block can span fragments when small files are coalesced
            for p in uniq:
                mask = pc.equal(paths, p)
                rows.append(self._process_group(data.filter(mask), p))
        return pa.Table.from_pylist(rows, schema=PARTIAL_SCHEMA)


def list_fragments(input_dir: str | Path) -> list[str]:
    d = Path(input_dir)
    return sorted(str(p) for p in d.glob("*.parquet"))


def run_suite(
    input_dir: str | Path,
    suite: Suite,
    out_dir: str | Path,
    *,
    run_id: str | None = None,
    resume: bool = True,
    key_col: str = "url",
    ref_tables: dict[str, str] | None = None,
    batch_size: int = 4096,
    extract_concurrency=None,
    baseline_path: str | Path | None = None,
) -> dict:
    """Run a validation suite end to end; returns the report dict.

    ``ref_tables`` maps a referential check's ``ref_table`` name to a
    parquet path/dir. Ray must already be initialised by the caller.
    """
    import ray.data as rd

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    run_id = run_id or uuid.uuid4().hex[:12]
    t_start = time.perf_counter()

    fragments = list_fragments(input_dir)
    if not fragments:
        raise FileNotFoundError(f"no parquet fragments under {input_dir}")
    path_to_pid = {f: i for i, f in enumerate(fragments)}

    manifest = Manifest(out, run_id)
    if not resume:
        for p in (out / "manifest").glob("*.json"):
            p.unlink()
    manifest.clean_incomplete(out / "violations")
    pending = manifest.pending(fragments)
    resumed_pids = sorted(manifest.completed_pids())

    needs_extract = any(c.kind == "extract_match" for c in suite.row_checks)
    stats_checks = [c for c in suite.table_checks if c.kind == "stats"]
    global_acc = StatsAccumulator(stats_checks)

    stats_dir = out / "stats"
    stats_dir.mkdir(exist_ok=True)
    if pending:
        pending_paths = [f for _, f in pending]
        expected = {f: pq.read_metadata(f).num_rows for f in pending_paths}
        ds = rd.read_parquet(pending_paths, include_paths=True)
        if needs_extract:
            from prompture_ray.functions.extract_html import HtmlExtractor
            ds = ds.map_batches(
                HtmlExtractor, batch_format="pyarrow", batch_size=256,
                concurrency=extract_concurrency or (2, 8))
        partials = ds.map_batches(
            ValidateAndSink(suite, str(out), key_col, path_to_pid),
            batch_format="pyarrow", batch_size=batch_size)

        # streaming driver fold + incremental per-fragment checkpointing.
        # Per-fragment sketch partials are persisted atomically BEFORE the
        # manifest record, so a crash can never produce a completed
        # fragment without its stats (memory stays bounded: only fragments
        # currently in flight hold an accumulator).
        seen: dict[str, dict] = {}
        for pb in partials.iter_batches(batch_size=64, batch_format="pyarrow"):
            for row in pb.to_pylist():
                path = row["path"]
                st = seen.setdefault(path, {
                    "rows": 0, "ok_rows": 0, "by_reason": {},
                    "elapsed_ms": 0.0, "acc": StatsAccumulator(stats_checks)})
                st["rows"] += row["rows"]
                st["ok_rows"] += row["ok_rows"]
                st["elapsed_ms"] += row["elapsed_ms"]
                for k, v in json.loads(row["viol_json"]).items():
                    st["by_reason"][k] = st["by_reason"].get(k, 0) + v
                if row["sketches"]:
                    st["acc"].merge_bytes(row["sketches"])
                if st["rows"] >= expected[path]:
                    pid = path_to_pid[path]
                    if stats_checks:
                        tmp = stats_dir / f"pid-{pid:05d}.tmp"
                        tmp.write_bytes(st["acc"].dumps())
                        tmp.rename(stats_dir / f"pid-{pid:05d}.pkl")
                    manifest.write(pid, {
                        "status": "completed",
                        "input_fragments": [path],
                        "rows": st["rows"],
                        "ok_rows": st["ok_rows"],
                        "violations": sum(st["by_reason"].values()),
                        "violations_by_reason": st["by_reason"],
                        "elapsed_ms": round(st["elapsed_ms"], 3),
                    })
                    del seen[path]

    # global stats = fold of per-partition sketch files of completed pids
    for pid in sorted(manifest.completed_pids()):
        p = stats_dir / f"pid-{pid:05d}.pkl"
        if p.exists():
            global_acc.merge_bytes(p.read_bytes())

    # ---- table-level checks (narrow-column passes; cached across resumes)
    table_results_path = out / "table_checks.json"
    if table_results_path.exists() and resume and not pending:
        table_results = json.loads(table_results_path.read_text())
    else:
        table_results = {}
        full = rd.read_parquet(fragments)
        for c in suite.table_checks:
            if c.kind == "unique":
                from prompture_ray.stages.table_checks import duplicate_keys
                dups = duplicate_keys(full, c.column).to_pandas()
                extra = int((dups["n"] - 1).sum()) if len(dups) else 0
                table_results[c.id] = {
                    "kind": "unique", "column": c.column,
                    "duplicate_keys": int(len(dups)),
                    "duplicate_rows": extra,
                    "sample": dups.sort_values(["n", c.column],
                                               ascending=[False, True])
                                   .head(10).to_dict("records"),
                }
            elif c.kind == "referential":
                from prompture_ray.stages.table_checks import referential_missing
                ref_path = (ref_tables or {}).get(c.ref_table)
                if ref_path is None:
                    table_results[c.id] = {"kind": "referential",
                                           "error": f"ref table {c.ref_table} not provided"}
                    continue
                right = rd.read_parquet(list_fragments(ref_path)
                                        if Path(ref_path).is_dir() else ref_path)
                missing = referential_missing(full, right, c.column,
                                              c.ref_column).to_pandas()
                table_results[c.id] = {
                    "kind": "referential", "column": c.column,
                    "missing_keys": int(len(missing)),
                    "missing_rows": int(missing["n"].sum()) if len(missing) else 0,
                }
        table_results_path.write_text(json.dumps(table_results, sort_keys=True))

    # ---- report assembly (driver-side, tiny data) -----------------------
    totals = manifest.totals()
    results = []
    for c in suite.row_checks:
        bad = sum(v for k, v in totals["violations_by_reason"].items()
                  if k == c.reason())
        results.append({
            "check_id": c.id, "column": c.column, "kind": c.kind,
            "total": totals["rows"], "violations": bad,
            "ok": totals["rows"] - bad,
            "pass_rate": round(1 - bad / totals["rows"], 6) if totals["rows"] else 1.0,
        })
    for c in suite.table_checks:
        if c.kind in ("unique", "referential") and c.id in table_results:
            tr = table_results[c.id]
            bad = tr.get("duplicate_rows", tr.get("missing_rows", 0))
            results.append({
                "check_id": c.id, "column": c.column, "kind": c.kind,
                "total": totals["rows"], "violations": bad,
                "ok": totals["rows"] - bad,
                "pass_rate": round(1 - bad / totals["rows"], 6) if totals["rows"] else 1.0,
            })

    stats_summaries = global_acc.summaries()

    drift = None
    if baseline_path and Path(baseline_path).exists() and stats_checks:
        baseline = load_baseline(baseline_path)
        len_check = next((c for c in stats_checks if "kll" in (c.sketches or ())), None)
        cat_check = next((c for c in stats_checks
                          if "countmin" in (c.sketches or ())
                          or "topk" in (c.sketches or ())), None)
        live_hist = None
        if len_check:
            live_hist = global_acc.sketches[len_check.id]["hist"]
        live_freq = {}
        if cat_check:
            top = global_acc.sketches[cat_check.id].get("topk")
            if top:
                total_c = sum(c for _, c in top.counts.items()) or 1
                live_freq = {str(v): c / total_c for v, c in top.counts.items()}
        if live_hist is not None:
            drift = score_drift(baseline, live_hist, live_freq)

    elapsed = time.perf_counter() - t_start
    report = {
        "meta": {**suite.meta, "run_id": run_id,
                 "input_dir": str(input_dir), "fragments": len(fragments),
                 "resumed_partitions": resumed_pids},
        "results": results,
        "stats": stats_summaries,
        "drift": drift,
        "run": {**totals, "wall_s": round(elapsed, 3),
                "docs_per_s": round(totals["rows"] / elapsed, 1) if elapsed else None,
                "checks_per_s": round(totals["rows"] * len(suite.row_checks) / elapsed, 1)
                if elapsed else None},
    }
    (out / "report.json").write_text(json.dumps(report, indent=2, sort_keys=True))
    return report
