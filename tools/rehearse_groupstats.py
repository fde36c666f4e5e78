"""Round-5 late-session scale rehearsal for the concordance /
group-prior / exact-nunique / robots / degree operators over the cached
synth webpages corpus (regenerate with ``python bench.py`` once).

Usage:  python tools/rehearse_groupstats.py [n_fragments]
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
import pyarrow.compute as pc
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
    from prompture_ray.functions.urlnorm import extract_hosts
    from prompture_ray.stages.concordance import keyword_contexts
    from prompture_ray.stages.graph import degree_table
    from prompture_ray.stages.groupstats import exact_nunique, group_prior
    from prompture_ray.stages.robots import robots_allowed

    frags = sorted(glob.glob(CORPUS))[:n_frag]
    if len(frags) < n_frag:
        raise SystemExit(
            f"only {len(frags)} cached fragments (need {n_frag}); "
            "run `python bench.py` once to build the corpus cache")

    def prep(t: pa.Table) -> pa.Table:
        urls = np.asarray(t["url"].to_pylist(), dtype=object)
        ids = hash64(urls).astype(np.int64)
        host = extract_hosts(t["url"].combine_chunks().cast(pa.string()))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "url": t["url"], "host": host, "text": t["text"],
            "n_chars": pc.utf8_length(
                t["text"].combine_chunks().cast(pa.string()))
            .cast(pa.int64())})

    def read_corpus():
        return rd.read_parquet(frags, columns=["url", "text"],
                               override_num_blocks=len(frags)) \
            .map_batches(prep, batch_format="pyarrow")

    res = {"n_fragments": n_frag}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        res[name] = round(time.perf_counter() - t0, 1)
        print(f"{name:28s} {res[name]:8.1f} s   ({out})", flush=True)

    ds = read_corpus().materialize()
    res["n_docs"] = ds.count()
    print(f"corpus: {res['n_docs']} docs / {n_frag} fragments",
          flush=True)

    # 1. concordance — zero shuffle, per-occurrence output
    timed("keyword_contexts", lambda: keyword_contexts(
        ds, "ka", window=16).count())

    # 2. per-host smoothed prior — tiny grouped Sum + broadcast map-back
    timed("group_prior", lambda: group_prior(
        ds.select_columns(["doc_id", "host", "n_chars"]),
        "host", "n_chars", pseudo_count=10, pseudo_sum=3000).count())

    # 3. exact distinct docs per host — one wide pre-deduped shuffle
    timed("exact_nunique", lambda: exact_nunique(
        ds.select_columns(["host", "doc_id"]), "host",
        "doc_id").count())

    # 4. robots compliance flags — zero shuffle, broadcast rules
    hosts = [f"h{i}.example" for i in range(64)]
    robots = {h: ("User-agent: *\nDisallow: /private\n"
                  "Allow: /private/ok\nDisallow: /tmp/*.pdf$\n")
              for h in hosts}
    timed("robots_allowed", lambda: robots_allowed(
        ds.select_columns(["doc_id", "url"]), "url", robots).count())

    # 5. degree table over planted edges — one grouped Sum of partials
    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(d % 1_000_003, type=pa.int64()),
            "dst": pa.array((d * 31 + 7) % 1_000_003,
                            type=pa.int64())})

    timed("degree_table", lambda: degree_table(
        ds.map_batches(edges, batch_format="pyarrow")).count())

    # 6. exact global quantiles — a handful of narrow histogram scans
    from prompture_ray.stages.selection import (exact_global_quantiles,
                                                exact_weighted_threshold)
    timed("exact_global_quantiles", lambda: exact_global_quantiles(
        ds.select_columns(["n_chars"]), "n_chars",
        qs=(0.25, 0.5, 0.75)))

    # 7. weighted budget threshold (token-budget sampling cut)
    def keyed():
        def key(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            h = ((d * np.uint64(2654435761)) % np.uint64(2 ** 32)) \
                .astype(np.int64)
            return pa.table({"h": pa.array(h, type=pa.int64()),
                             "n_chars": t["n_chars"]})
        return ds.map_batches(key, batch_format="pyarrow")

    timed("weighted_threshold", lambda: exact_weighted_threshold(
        keyed(), "h", "n_chars", budget=10 ** 9))

    # 8. forward fill — one full row shuffle + per-partition ffill
    from prompture_ray.stages.analytic import forward_fill

    def gaps(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(float)
        v[d % 3 == 0] = np.nan
        return pa.table({"host": t["host"],
                         "ts": pa.array(d, type=pa.int64()),
                         "tie": t["doc_id"],
                         "v": pa.array(v, type=pa.float64())})

    timed("forward_fill", lambda: forward_fill(
        ds.map_batches(gaps, batch_format="pyarrow"),
        "host", "ts", "tie", ["v"]).count())

    # 9. per-key lag shift — same single-shuffle shape
    from prompture_ray.stages.analytic import lag_shift, suppress_bursts

    def ordered(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"host": t["host"],
                         "ts": pa.array(d, type=pa.int64()),
                         "tie": t["doc_id"],
                         "n_chars": t["n_chars"]})

    timed("lag_shift", lambda: lag_shift(
        ds.map_batches(ordered, batch_format="pyarrow"),
        "host", "ts", "tie", ["n_chars"], shifts=(1,)).count())

    # 10. burst suppression — lag + filter in the same pass
    timed("suppress_bursts", lambda: suppress_bursts(
        ds.map_batches(ordered, batch_format="pyarrow"),
        "host", "ts", "tie", min_gap=2 ** 40).count())

    # 11. grouped median/MAD outliers — two lexsorts per partition
    from prompture_ray.stages.groupstats import grouped_outliers
    timed("grouped_outliers", lambda: grouped_outliers(
        ds.select_columns(["host", "doc_id", "n_chars"]),
        "host", "n_chars", k=3).count())

    # 12. long->wide pivot — per-batch partials, one narrow grouped Sum
    from prompture_ray.stages.rollup import pivot_counts

    def lang_col(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        langs = np.array(["en", "de", "fr", "es", "it"], dtype=object)
        return pa.table({"host": t["host"],
                         "lang": pa.array(langs[d % 5])})

    timed("pivot_counts", lambda: pivot_counts(
        ds.map_batches(lang_col, batch_format="pyarrow"),
        "host", "lang", ["en", "de", "fr", "es", "it"]).count())

    # 13. CDC chunk dedup — one vectorized byte pass + narrow chunk rows
    from prompture_ray.stages.cdc_chunks import cdc_chunk_stats
    timed("cdc_chunk_stats", lambda: cdc_chunk_stats(
        ds.select_columns(["doc_id", "text"]),
        "text", "doc_id").count())

    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
