"""Round-5 fourth-session curation-operator scale rehearsal: walls for
the C4 line/page filter, the URL domain-blocklist filter, vocabulary
coverage, and the deterministic shard shuffle over the cached synth
webpages corpus (regenerate with ``python bench.py`` once; ~2.5 min).

Usage:  python tools/rehearse_curation.py [n_fragments]
        (150 ≈ 909k docs, 1500 ≈ 9.09M)

Run from the repo root with nothing else on the machine; walls are only
comparable within a session (CLAUDE.md machine-noise protocol).
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray

CORPUS = "/tmp/prompture_ray_bench/webpages_9000000/pages/*.parquet"


def main() -> int:
    n_frag = int(sys.argv[1]) if len(sys.argv) > 1 else 150

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd
    from prompture_ray.functions.sketches import hash64
    from prompture_ray.functions.urlnorm import domain_blocklist_flags
    from prompture_ray.stages.c4 import c4_line_filter
    from prompture_ray.stages.sampling import assign_shards
    from prompture_ray.stages.tfidf import vocab_coverage

    frags = sorted(glob.glob(CORPUS))[:n_frag]
    if len(frags) < n_frag:
        raise SystemExit(
            f"only {len(frags)} cached fragments (need {n_frag}); "
            "run `python bench.py` once to build the corpus cache")

    def prep(t: pa.Table) -> pa.Table:
        urls = np.asarray(t["url"].to_pylist(), dtype=object)
        ids = hash64(urls).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "url": t["url"], "text": t["text"]})

    def read_corpus():
        return rd.read_parquet(frags, columns=["url", "text"],
                               override_num_blocks=len(frags)) \
            .map_batches(prep, batch_format="pyarrow")

    res = {"n_fragments": n_frag}
    corpus = read_corpus().materialize()
    res["n_docs"] = corpus.count()

    def consume(label, ds_out, cols):
        t0 = time.perf_counter()
        n = 0
        for b in ds_out.select_columns(cols) \
                .iter_batches(batch_format="pyarrow"):
            n += b.num_rows
        res[label + "_s"] = round(time.perf_counter() - t0, 2)
        return n

    # C4 line/page filter (zero shuffle)
    out = c4_line_filter(corpus, "text", "doc_id")
    n = consume("c4_filter", out, ["doc_id", "n_lines_kept", "page_kept"])
    assert n == res["n_docs"]

    # URL blocklist (zero shuffle)
    out = domain_blocklist_flags(corpus, "url",
                                 ["tracker.net", "spam.example"])
    n = consume("blocklist", out, ["doc_id", "blocked"])
    assert n == res["n_docs"]

    # vocabulary coverage (one narrow df shuffle + broadcast lookup)
    out = vocab_coverage(corpus, "text", "doc_id", min_df=2)
    consume("vocab_coverage", out, ["id", "n_tokens", "n_oov"])

    # deterministic shard shuffle (one row shuffle of the id projection
    # — a shard writer ships payloads too; this measures the rank
    # machinery itself)
    ids_only = corpus.select_columns(["doc_id"]).materialize()
    out = assign_shards(ids_only, "doc_id", n_shards=64)
    n = consume("assign_shards", out, ["doc_id", "shard", "pos"])
    assert n == res["n_docs"]

    spill = 0
    try:
        from ray._private.internal_api import memory_summary
        s = memory_summary(stats_only=True)
        spill = 1 if "Spilled" in s and "0 MiB" not in s.split(
            "Spilled")[1][:20] else 0
    except Exception:
        spill = -1
    res["spilled"] = spill
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
