"""CLI: ``python -m prompture_ray <command>``.

Commands (descendant of the reference CLI surface, prompture/cli/cli.py:
``prompture run specfile outfile`` / ``prompture test-suite``):

  run        run a validation suite over a parquet directory
  synth      generate the deterministic web_pages/warc tables
  baseline   build a pinned drift-baseline snapshot from clean data
  report     pretty-print a run's report.json rollup

The CLI owns its Ray session (the library never calls ray.init —
the driver/test harness own theirs).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _init_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_run(args) -> int:
    from prompture_ray.specs import load_suite, default_webpages_suite
    from prompture_ray.pipelines.validate_pipeline import run_suite

    ray = _init_ray(args.num_cpus)
    try:
        suite = (load_suite(args.suite) if args.suite
                 else default_webpages_suite(
                     ref_warc="warc_records" if args.ref else None))
        ref_tables = {}
        for spec in args.ref or []:
            name, path = spec.split("=", 1)
            ref_tables[name] = path
        report = run_suite(args.input, suite, args.out,
                           ref_tables=ref_tables or None,
                           resume=not args.no_resume,
                           run_id=args.run_id,
                           batch_size=args.batch_size,
                           baseline_path=args.baseline)
        _print_rollup(report)
        print(f"report written to {Path(args.out) / 'report.json'}")
        return 0
    finally:
        ray.shutdown()


def cmd_synth(args) -> int:
    from prompture_ray.synth import generate

    ray = _init_ray(args.num_cpus)
    try:
        info = generate(args.out, n_rows=args.rows, n_parts=args.parts,
                        seed=args.seed, words_scale=args.words_scale)
        print(json.dumps({k: v for k, v in info.items() if k != "pages"}))
        return 0
    finally:
        ray.shutdown()


def cmd_baseline(args) -> int:
    import pyarrow.parquet as pq
    import pyarrow as pa
    from prompture_ray.stages.stats import create_baseline, save_baseline

    files = sorted(Path(args.input).glob("*.parquet"))
    table = pa.concat_tables([pq.read_table(f) for f in files])
    baseline = create_baseline(table)
    save_baseline(baseline, args.out)
    print(f"baseline over {table.num_rows} rows → {args.out}")
    return 0


def _print_rollup(report: dict) -> None:
    """Pass/total rollup table (shape of the reference's format_table,
    prompture/cli/formatters.py:8-73)."""
    print(f"{'check':<16}{'kind':<16}{'violations':>12}{'pass_rate':>12}")
    for r in report["results"]:
        print(f"{r['check_id']:<16}{r['kind']:<16}"
              f"{r['violations']:>12}{r['pass_rate']:>12.4f}")
    run = report["run"]
    print(f"-- rows={run['rows']} ok={run['ok_rows']} "
          f"violations={run['violations']} docs/s={run.get('docs_per_s')}")
    if report.get("drift"):
        print(f"-- drift: {report['drift']}")


def cmd_compact(args) -> int:
    from prompture_ray.state.compact import compact_violations

    ray = _init_ray(args.num_cpus)
    try:
        print(json.dumps(compact_violations(args.out_dir)))
        return 0
    finally:
        ray.shutdown()


def cmd_report(args) -> int:
    report = json.loads(Path(args.path).read_text())
    _print_rollup(report)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="prompture_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run a validation suite")
    r.add_argument("input", help="parquet directory (web_pages fragments)")
    r.add_argument("out", help="output/run directory")
    r.add_argument("--suite", help="suite JSON (default: built-in webpages suite)")
    r.add_argument("--ref", action="append",
                   help="referential table: name=path (repeatable)")
    r.add_argument("--baseline", help="drift baseline JSON path")
    r.add_argument("--run-id", dest="run_id")
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--batch-size", type=int, default=4096)
    r.add_argument("--num-cpus", type=int)
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("synth", help="generate the synthetic web_pages table")
    s.add_argument("out")
    s.add_argument("--rows", type=int, default=10_000)
    s.add_argument("--parts", type=int, default=8)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--words-scale", type=float, default=1.0)
    s.add_argument("--num-cpus", type=int)
    s.set_defaults(fn=cmd_synth)

    b = sub.add_parser("baseline", help="build a drift baseline snapshot")
    b.add_argument("input", help="parquet directory of clean pages")
    b.add_argument("out", help="baseline JSON path")
    b.set_defaults(fn=cmd_baseline)

    rep = sub.add_parser("report", help="pretty-print a report.json")
    rep.add_argument("path")
    rep.set_defaults(fn=cmd_report)

    cp = sub.add_parser("compact", help="compact violation part files")
    cp.add_argument("out_dir", help="a run's output directory")
    cp.add_argument("--num-cpus", type=int)
    cp.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
