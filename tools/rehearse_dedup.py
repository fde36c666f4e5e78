"""End-to-end dedup-pipeline scale rehearsal (BASELINE.md round-5
section; VERDICT r4 item 7).

Composes minhash → distributed connected components → kept-filter over
the cached 9M-row synth webpages corpus (regenerate with
``python bench.py`` once; ~2.5 min) at a chosen size, with 1% planted
exact-duplicate twins (id = hash64(url) + 1) so the component and
kept-filter stages do real work on hash-magnitude int64 ids. Prints one
JSON line: wall, kept/removed counts, pair stats, object-store spill
lines (expected: none).

Usage:
    python tools/rehearse_dedup.py <n_fragments> [pair_mode]

n_fragments: 15 ≈ 90.9k docs, 150 ≈ 909k, 1500 ≈ 9.09M (full corpus).
pair_mode: "triangle" (default; the oracle-pinned pair semantics) or
"star" (the O(k)-per-bucket 100-TB path — see dedup.py docstring).

Run from the repo root (workers import prompture_ray from cwd) with
nothing else on the machine; wall numbers are only comparable within a
session (CLAUDE.md machine-noise protocol).
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

CORPUS = "/tmp/prompture_ray_bench/webpages_9000000/pages/*.parquet"


def main() -> int:
    n_frag = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    pair_mode = sys.argv[2] if len(sys.argv) > 2 else "triangle"

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd
    from prompture_ray.stages.dedup import dedup_minhash
    from prompture_ray.functions.sketches import hash64

    frags = sorted(glob.glob(CORPUS))[:n_frag]
    if len(frags) < n_frag:
        raise SystemExit(
            f"only {len(frags)} cached fragments (need {n_frag}); "
            "run `python bench.py` once to build the corpus cache")

    def prep(t: pa.Table) -> pa.Table:
        urls = np.asarray(t["url"].to_pylist(), dtype=object)
        ids = hash64(urls).astype(np.int64)
        return pa.table({"id": pa.array(ids), "text": t["text"]})

    def twins(t: pa.Table) -> pa.Table:
        t = t.take(np.arange(0, t.num_rows, 100))
        return pa.table({"id": pc.add(t["id"], pa.scalar(1, pa.int64())),
                         "text": t["text"]})

    base = rd.read_parquet(frags, columns=["url", "text"],
                           override_num_blocks=len(frags)) \
        .map_batches(prep, batch_format="pyarrow")
    corpus = base.union(base.map_batches(twins, batch_format="pyarrow")) \
        .materialize()
    n_corpus = corpus.count()

    t0 = time.perf_counter()
    kept, stats = dedup_minhash(corpus, "text", "id",
                                components="distributed", threshold=0.8,
                                pair_mode=pair_mode)
    n_kept = kept.count()
    wall = round(time.perf_counter() - t0, 2)

    spilled = []
    for f in glob.glob("/tmp/ray/ray/session_latest/logs/raylet.out"):
        with open(f, errors="ignore") as fh:
            spilled += [ln.strip()[:160] for ln in fh
                        if "Spilled" in ln][-3:]
    print(json.dumps({
        "n_fragments": n_frag, "pair_mode": pair_mode,
        "n_corpus": n_corpus, "n_kept": n_kept,
        "removed": n_corpus - n_kept, "wall_s": wall,
        "docs_per_s": round(n_corpus / wall, 1),
        "stats": {k: v for k, v in stats.items()
                  if isinstance(v, (int, float, str))},
        "spill_lines": spilled,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
