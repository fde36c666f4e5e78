"""Benchmark harness. Prints ONE JSON line:

  {"metric": "suite_seconds", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "num_cpus": N,
   "flagship": {"rows": R, "docs_per_s": D, "checks_per_s": C}}

Headline = the flagship web_pages validation suite (synthesized,
deterministic, cached under /tmp) + representative operator queries over
$GRAFT_SF_DIR (default /root/testdata/sf0.1).

``--scaling`` runs the same bench in fresh subprocesses at num_cpus=8 and
num_cpus=32 on the same input and reports throughput at both plus the
scaling efficiency (the sandbox stand-in for the N vs 4N cluster-size
criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROOT = Path(os.environ.get("GRAFT_BENCH_ROOT", "/tmp/prompture_ray_bench"))
# flagship input size scales with the sf dir (sf0.1 → 3M pages — large
# enough that the parallel scan dominates fixed startup costs, which is
# what the 8-vs-32-CPU scaling-efficiency criterion measures)
_SF_ROWS = {"sf0.001": 8_000, "sf0.01": 40_000, "sf0.1": 4_500_000}


def _sf_name() -> str:
    return Path(SF_DIR).name


def flagship_rows() -> int:
    return int(os.environ.get("GRAFT_BENCH_ROWS",
                              _SF_ROWS.get(_sf_name(), 100_000)))


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from prompture_ray.synth import generate
    from prompture_ray.specs import default_webpages_suite
    from prompture_ray.pipelines.validate_pipeline import run_suite
    from prompture_ray.pipelines.queries import QUERIES

    timings: dict[str, float] = {}

    # ---- flagship: full web_pages validation suite ----------------------
    rows = flagship_rows()
    data_dir = BENCH_ROOT / f"webpages_{rows}"
    # ~6k rows per fragment: blocks stay ~25 MB so task waves balance and
    # stragglers don't idle a 32-CPU run (measured 3× faster than 95 MB
    # blocks), and per-fragment checkpoints stay fine-grained
    n_parts = max(64, rows // 6_000)
    generate(data_dir, n_rows=rows, n_parts=n_parts, words_scale=3.0)

    # warm page cache so we measure compute+shuffle, not first disk read
    for p in (data_dir / "pages").glob("*.parquet"):
        p.read_bytes()
    # warm the Ray worker pool (untimed): the first Dataset execution in a
    # process pays worker-spawn + import costs that are not part of the
    # job being measured
    import ray.data as rd
    rd.range(NUM_CPUS * 1000, override_num_blocks=NUM_CPUS) \
        .map_batches(lambda b: b).count()

    out_dir = BENCH_ROOT / f"out_{rows}_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    suite = default_webpages_suite(ref_warc="warc_records")
    t0 = time.perf_counter()
    report = run_suite(data_dir / "pages", suite, out_dir,
                       ref_tables={"warc_records": str(data_dir / "warc")},
                       resume=False, run_id=f"bench{NUM_CPUS}",
                       batch_size=4096)
    t_flagship = time.perf_counter() - t0
    timings["flagship_webpages"] = round(t_flagship, 3)
    n_row_checks = len(suite.row_checks)

    # ---- operator queries over the sf dir -------------------------------
    bench_queries = ["q1_lineitem", "events_hourly", "dedup_first_events",
                     "token_stats_by_lang", "ref_events_supplier",
                     "duplicate_custkeys_in_orders"]
    for name in bench_queries:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        # consume (Datasets are lazy)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "suite_seconds", "value": total, "unit": "sec",
        "queries": timings,
        "sf": _sf_name(), "num_cpus": NUM_CPUS,
        "flagship": {
            "rows": rows,
            "docs_per_s": round(rows / t_flagship, 1),
            "checks_per_s": round(rows * n_row_checks / t_flagship, 1),
        },
    }


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=8 vs 32 → scaling efficiency."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t8 = results[8]["queries"]["flagship_webpages"]
    t32 = results[32]["queries"]["flagship_webpages"]
    d8 = results[8]["flagship"]["docs_per_s"]
    d32 = results[32]["flagship"]["docs_per_s"]
    eff = (d32 / d8) / (32 / 8)
    return {
        "metric": "scaling_efficiency", "value": round(eff, 3), "unit": "ratio",
        "flagship_rows": results[8]["flagship"]["rows"],
        "sec_8": t8, "sec_32": t32,
        "docs_per_s_8": d8, "docs_per_s_32": d32,
        "checks_per_s_8": results[8]["flagship"]["checks_per_s"],
        "checks_per_s_32": results[32]["flagship"]["checks_per_s"],
        "total_8": results[8]["value"], "total_32": results[32]["value"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
