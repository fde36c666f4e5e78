"""Change-data-capture merge: apply insert/update/delete deltas to a
corpus snapshot (the incremental-crawl-refresh primitive — a re-crawl
ships per-url changes; the new snapshot is latest-change-wins with
deletes removed).

The reference validates one static snapshot; this extends the corpus
lifecycle the same way ``stages/diff.py`` (snapshot diff) does, on the
ingest side.

Scale shape (the dedup_exact pattern, stages/dedup.py:60-145, inverted
to LAST-wins): union base + deltas, ONE global sort by (key, seq), then
per-block vectorized shift-compare keeps each key's final change; the
only cross-block state is 4 boundary-metadata values per block (first /
last key+seq), folded on the driver into a drop-set of at most
one (key, seq) pair per block. Rows whose final change is a delete are
filtered. No join, no per-key pandas groups, no driver data rows.

Requires (key, seq) unique across base+deltas (the dedup_exact
order-col contract): equal seqs for one key make "latest" ambiguous.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def apply_changes(base_ds, delta_ds, key_col: str, seq_col: str,
                  op_col: str = "op", base_seq: int = 0,
                  keep_meta: bool = False):
    """Merge ``delta_ds`` (rows carry ``op`` ∈ {'I','U','D'} and a
    monotonically increasing ``seq``) into ``base_ds`` (tagged as
    inserts at ``base_seq``). Returns the new snapshot Dataset: for
    every key the row with the highest seq, dropped if that row's op is
    'D'. ``keep_meta`` retains the op/seq columns."""
    import ray
    from prompture_ray.functions.sketches import hash64

    data_cols = [c for c in base_ds.schema().names
                 if c not in (op_col, seq_col)]

    def _key64(t: pa.Table) -> pa.Array:
        """Sortable int64 key: integer keys pass through; other types
        are hashed (same 2^-64 collision acceptance as dedup_exact —
        a collision interleaves two keys' runs)."""
        arr = t[key_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_integer(arr.type):
            return pc.cast(arr, pa.int64())
        h = hash64(np.asarray(arr.to_pylist(), dtype=object))
        return pa.array(h.view(np.int64))

    def tag_base(t: pa.Table) -> pa.Table:
        t = t.select(data_cols)
        t = t.append_column(seq_col, pa.array(
            np.full(t.num_rows, base_seq, dtype=np.int64)))
        t = t.append_column(op_col, pa.array(["I"] * t.num_rows))
        return t.append_column("__k", _key64(t))

    def order_delta(t: pa.Table) -> pa.Table:
        t = t.select(data_cols + [seq_col, op_col])
        return t.append_column("__k", _key64(t))

    both = base_ds.map_batches(tag_base, batch_format="pyarrow").union(
        delta_ds.map_batches(order_delta, batch_format="pyarrow"))
    srt = both.sort(["__k", seq_col]).materialize()

    # pass A (tiny): boundary metadata, 1 row per block
    def edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "first_key": pc.cast(t["__k"].slice(0, 1), pa.int64()),
            "first_seq": pc.cast(t[seq_col].slice(0, 1), pa.int64()),
            "last_key": pc.cast(t["__k"].slice(max(n - 1, 0), 1),
                                pa.int64()),
            "last_seq": pc.cast(t[seq_col].slice(max(n - 1, 0), 1),
                                pa.int64()),
        })

    eb = srt.map_batches(edges, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    drop: set = set()
    if len(eb):
        eb = eb.sort_values(["first_key", "first_seq"],
                            ignore_index=True)
        prev = None                       # (last_key, last_seq)
        for row in eb.itertuples():
            if prev is not None and prev[0] == row.first_key:
                # the previous block's final run continues here — its
                # last row is not that key's latest change
                drop.add(prev)
            prev = (int(row.last_key), int(row.last_seq))
    drop_ref = ray.put(drop)

    # pass B: vectorized keep-LAST per block + delete filter
    def keep(t: pa.Table) -> pa.Table:
        out_cols = data_cols + ([seq_col, op_col] if keep_meta else [])
        if t.num_rows == 0:
            return t.select(out_cols)
        k = t["__k"].to_numpy(zero_copy_only=False)
        n = len(k)
        mask = np.empty(n, dtype=bool)
        mask[-1] = True
        mask[:-1] = k[:-1] != k[1:]
        dk = ray.get(drop_ref)
        if dk:
            last = (int(k[-1]), int(t[seq_col][n - 1].as_py()))
            if last in dk:
                mask[-1] = False
        ops = t[op_col].to_numpy(zero_copy_only=False)
        mask &= (ops != "D")
        return t.filter(pa.array(mask)).select(out_cols)

    return srt.map_batches(keep, batch_format="pyarrow", batch_size=None)
