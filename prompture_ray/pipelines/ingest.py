"""Incremental corpus-ingestion pipeline — the composed 100-TB story
the two persisted indexes exist for (beyond the reference, whose dedup
is single-run): each crawl wave is filtered against EVERYTHING ingested
before it (exact first, then near-dup), and the surviving rows are
appended to both indexes so the next wave sees them.

    wave ──► exact filter (dedup_index: zero-shuffle hash membership)
          ──► near-dup filter (minhash_index: zero-shuffle LSH lookup
               + exact permutation-agreement verify)
          ──► kept rows ──► delta-update BOTH indexes

Per-wave cost is one streaming pass over the wave (two map_batches
against broadcast index arrays) plus the two delta writes — the old
corpus is never re-read. Exact dups never pay a MinHash verify (they
are filtered before the near-dup stage).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from prompture_ray.stages.dedup_index import (dedup_against_index,
                                              update_dedup_index)
from prompture_ray.stages.minhash_index import (minhash_index_flags,
                                                update_minhash_index)


def ingest_wave(wave_ds, dedup_index_dir: str, minhash_index_dir: str,
                id_col: str = "doc_id", threshold: float = 0.8,
                update: bool = True):
    """Run one wave through the exact→near-dup→update pipeline.

    Returns ``(kept_ds, verdicts_ds)``:
    - ``kept_ds`` — the surviving wave rows (materialized; already
      appended to both indexes when ``update=True``),
    - ``verdicts_ds`` — one audit row per wave row:
      ``(id_col, verdict ∈ {exact_dup, near_dup, kept},
      match_id — the best near-dup match, -1 otherwise)``.
    """
    flagged = dedup_against_index(wave_ds, dedup_index_dir,
                                  flag_col="_is_new").materialize()

    def exact_side(t: pa.Table) -> pa.Table:
        keep = t.filter(pa.compute.invert(t["_is_new"].combine_chunks()))
        n = keep.num_rows
        return pa.table({
            id_col: keep[id_col],
            "verdict": pa.array(["exact_dup"] * n, type=pa.string()),
            "match_id": pa.array(np.full(n, -1, dtype=np.int64))})

    def new_side(t: pa.Table) -> pa.Table:
        return t.filter(t["_is_new"].combine_chunks()) \
            .drop_columns(["_is_new"])

    exact_verdicts = flagged.map_batches(exact_side,
                                         batch_format="pyarrow")
    survivors = flagged.map_batches(new_side, batch_format="pyarrow")

    near = minhash_index_flags(survivors, minhash_index_dir,
                               threshold=threshold,
                               flag_col="_near_dup").materialize()

    def near_verdicts_fn(t: pa.Table) -> pa.Table:
        dup = t["_near_dup"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            "verdict": pa.array(
                np.where(dup, "near_dup", "kept").tolist(),
                type=pa.string()),
            "match_id": pa.array(
                np.where(dup,
                         t["match_id"].to_numpy(zero_copy_only=False),
                         -1), type=pa.int64())})

    def kept_fn(t: pa.Table) -> pa.Table:
        mask = pa.compute.invert(t["_near_dup"].combine_chunks())
        return t.filter(mask).drop_columns(
            ["_near_dup", "match_id", "est_jaccard", "truncated"])

    verdicts = exact_verdicts.union(
        near.map_batches(near_verdicts_fn, batch_format="pyarrow"))
    kept = near.map_batches(kept_fn,
                            batch_format="pyarrow").materialize()

    if update:
        update_dedup_index(dedup_index_dir, kept)
        update_minhash_index(minhash_index_dir, kept)
    return kept, verdicts
