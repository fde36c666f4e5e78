"""Persisted-index scale rehearsal (round 5): build + wave-lookup walls
for the exact-dedup hash index and the MinHash-LSH near-dup index over
the cached synth webpages corpus (regenerate with ``python bench.py``
once; ~2.5 min).

The wave is 2% of the corpus: half exact copies of corpus docs (must
flag), half fresh texts (must not). Prints one JSON line with build /
lookup / update walls, flag counts, and the broadcast index sizes.

Usage:  python tools/rehearse_index.py [n_fragments]
        (15 ≈ 90.9k docs, 150 ≈ 909k, 1500 ≈ 9.09M)

Run from the repo root with nothing else on the machine; walls are
only comparable within a session (CLAUDE.md machine-noise protocol).
NOTE: minhash_index broadcast cost is ~1.25 KB/doc (n_perm=128) —
909k docs ≈ 1.1 GB in the object store; the 9M full corpus would be
~11 GB, the documented edge of the broadcast path.
"""
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray

CORPUS = "/tmp/prompture_ray_bench/webpages_9000000/pages/*.parquet"
OUT = "/tmp/prompture_ray_rehearse_idx"


def main() -> int:
    n_frag = int(sys.argv[1]) if len(sys.argv) > 1 else 150

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd
    from prompture_ray.stages.dedup_index import (
        build_dedup_index, dedup_against_index, update_dedup_index)
    from prompture_ray.stages.minhash_index import (
        build_minhash_index, minhash_index_flags)

    frags = sorted(glob.glob(CORPUS))[:n_frag]
    if len(frags) < n_frag:
        raise SystemExit(
            f"only {len(frags)} cached fragments (need {n_frag}); "
            "run `python bench.py` once to build the corpus cache")

    def prep(t: pa.Table) -> pa.Table:
        from prompture_ray.functions.sketches import hash64
        urls = np.asarray(t["url"].to_pylist(), dtype=object)
        ids = hash64(urls).astype(np.int64)      # hash-magnitude ids
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": t["text"]})

    def read_corpus():
        return rd.read_parquet(frags, columns=["url", "text"],
                               override_num_blocks=len(frags)) \
            .map_batches(prep, batch_format="pyarrow")

    # wave: every 100th doc = exact copy (flag), every 100th+1 = fresh
    def wave_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = np.asarray(t["text"].to_pylist(), dtype=object)
        copy_m = ids % 100 == 0
        fresh_m = ids % 100 == 1
        out_ids = np.concatenate([ids[copy_m] + 50_000_000,
                                  ids[fresh_m] + 60_000_000])
        out_txt = np.concatenate([
            txt[copy_m],
            np.asarray([f"fresh wave doc {i} " + "pad " * 50
                        for i in ids[fresh_m]], dtype=object)])
        return pa.table({
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "text": pa.array(out_txt.tolist(), type=pa.string())})

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    res = {"n_fragments": n_frag}

    corpus = read_corpus()
    n_docs = corpus.count()
    res["n_docs"] = n_docs

    # ---- exact-dedup hash index --------------------------------------
    t0 = time.perf_counter()
    build_dedup_index(read_corpus(), "text", f"{OUT}/didx",
                      n_buckets=max(64, n_docs // 5_000_000))
    res["dedup_index_build_s"] = round(time.perf_counter() - t0, 2)

    wave = read_corpus().map_batches(wave_rows, batch_format="pyarrow")
    t0 = time.perf_counter()
    flags = dedup_against_index(wave, f"{OUT}/didx", flag_col="is_new")
    agg = flags.map_batches(
        lambda t: pa.table({"dup": [int((~np.asarray(
            t["is_new"].to_pylist())).sum())],
            "n": [t.num_rows]}),
        batch_format="pyarrow").to_pandas().sum()
    res["dedup_index_lookup_s"] = round(time.perf_counter() - t0, 2)
    res["dedup_wave_rows"] = int(agg["n"])
    res["dedup_wave_dups"] = int(agg["dup"])

    def fresh_only(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids >= 60_000_000))

    t0 = time.perf_counter()
    update_dedup_index(f"{OUT}/didx",
                       wave.map_batches(fresh_only,
                                        batch_format="pyarrow"))
    res["dedup_index_update_s"] = round(time.perf_counter() - t0, 2)

    # ---- minhash near-dup index --------------------------------------
    t0 = time.perf_counter()
    build_minhash_index(read_corpus(), "text", "doc_id", f"{OUT}/mhidx",
                        n_buckets=32)
    res["minhash_index_build_s"] = round(time.perf_counter() - t0, 2)
    sig_bytes = sum(os.path.getsize(p) for p in glob.glob(
        f"{OUT}/mhidx/sigs/bucket=*/*.parquet"))
    band_bytes = sum(os.path.getsize(p) for p in glob.glob(
        f"{OUT}/mhidx/bands/bucket=*/*.parquet"))
    res["minhash_index_mb"] = round((sig_bytes + band_bytes) / 1e6, 1)

    t0 = time.perf_counter()
    mf = minhash_index_flags(wave, f"{OUT}/mhidx", threshold=0.8)
    agg2 = mf.map_batches(
        lambda t: pa.table({"dup": [int(np.asarray(
            t["is_dup"].to_pylist()).sum())],
            "n": [t.num_rows]}),
        batch_format="pyarrow").to_pandas().sum()
    res["minhash_index_lookup_s"] = round(time.perf_counter() - t0, 2)
    res["minhash_wave_dups"] = int(agg2["dup"])

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
    shutil.rmtree(OUT, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
