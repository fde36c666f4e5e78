"""Table-level checks: uniqueness and referential integrity.

These are the wide (shuffle) operations of the suite — kept on narrow
projected columns so the exchange moves keys, not pages (SURVEY §7.3).

- uniqueness: per-batch partial value counts (combiner) → small
  ``groupby(key).sum`` → keys with count > 1. Pre-aggregation inside
  ``map_batches`` bounds the shuffle to distinct-keys-per-block rows.
- referential (url → warc record): the reference's nearest analog is the
  KG entity lookup (reference prompture/kg/core.py:63-76,150-182);
  distributed it becomes an anti-join. Two strategies:
    * broadcast: right side small → ``ray.put`` a sorted key-hash array
      once; each batch does a vectorized ``searchsorted`` membership test —
      no shuffle at all.
    * partitioned: both sides large → hash-bucket both on the key,
      ``groupby(bucket).map_groups`` computes the per-bucket set
      difference. One narrow shuffle of the two key columns.
  A Bloom prefilter (``functions.sketches.Bloom``) can cut the partitioned
  path's left volume; with the broadcast path it is unnecessary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from prompture_ray.functions.sketches import hash64

BROADCAST_THRESHOLD = 5_000_000  # keys; ~40MB of hashes — fine to broadcast


def value_count_partials(col: str):
    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = arr.value_counts()
        return pa.table({col: vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})
    return partial


def duplicate_keys(ds, col: str):
    """Dataset of ``(col, n)`` for keys appearing more than once."""
    partials = ds.select_columns([col]).map_batches(
        value_count_partials(col), batch_format="pyarrow")
    agg = partials.groupby(col).aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(lambda t: t.filter(pc.greater(t["n"], 1)),
                           batch_format="pyarrow")


def distinct_count(ds, col: str) -> int:
    """Exact distinct count via the same partial-aggregation pattern."""
    partials = ds.select_columns([col]).map_batches(
        value_count_partials(col), batch_format="pyarrow")
    return partials.groupby(col).aggregate(Sum("n", alias_name="n")).count()


class _BroadcastAntiJoin:
    """map_batches callable: keep rows whose key is NOT in the broadcast
    sorted key-hash array (actor-ish init cost amortized via ray.put)."""

    def __init__(self, key: str, sorted_hashes_ref):
        self.key = key
        self.ref = sorted_hashes_ref
        self._hashes = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._hashes is None:
            self._hashes = ray.get(self.ref) if not isinstance(self.ref, np.ndarray) else self.ref
        arr = t[self.key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h = hash64(np.asarray(arr.to_pylist(), dtype=object))
        idx = np.searchsorted(self._hashes, h)
        idx = np.clip(idx, 0, len(self._hashes) - 1)
        present = self._hashes[idx] == h if len(self._hashes) else np.zeros(len(h), bool)
        missing = ~present
        return t.filter(pa.array(missing))


def build_bloom(ds, col: str, n_bits: int = 1 << 24, n_hashes: int = 5):
    """Distributed Bloom build: per-batch key-hash blobs → driver folds
    them into one filter via ``add_hashes`` (OR-merge equivalent). The
    blobs are 8 bytes/row; the filter itself never ships between workers
    during the build."""
    import numpy as np
    from prompture_ray.functions.sketches import Bloom, hash64

    def blob(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.drop_null()
        h = (hash64(np.asarray(arr.to_pylist(), dtype=object))
             if len(arr) else np.empty(0, dtype=np.uint64))
        return pa.table({"h": pa.array([h.tobytes()], type=pa.binary())})

    bloom = Bloom(n_bits, n_hashes)
    for b in ds.map_batches(blob, batch_format="pyarrow") \
               .iter_batches(batch_size=None, batch_format="pyarrow"):
        for raw in b["h"].to_pylist():
            bloom.add_hashes(np.frombuffer(raw, dtype=np.uint64))
    return bloom


def referential_missing(left_ds, right_ds, key: str, right_key: str | None = None,
                        broadcast_threshold: int = BROADCAST_THRESHOLD,
                        n_buckets: int = 64, bloom_prefilter: bool = True):
    """Rows of ``left_ds`` (projected to ``key``) whose key has no match in
    ``right_ds[right_key]``. Returns a Dataset with columns (key, n).

    Partitioned path with ``bloom_prefilter``: a Bloom filter of the LEFT
    keys drops right rows that cannot affect the anti-join result before
    the shuffle (false positives only let extra right rows through —
    exactness is preserved; the win is shuffle volume when the right side
    dwarfs the overlap)."""
    right_key = right_key or key
    left = left_ds.select_columns([key])
    right = right_ds.select_columns([right_key])

    n_right = right.count()
    if n_right <= broadcast_threshold:
        # hash the right keys once on the driver side (streamed), broadcast
        hashes = []
        for b in right.iter_batches(batch_size=65536, batch_format="pyarrow"):
            arr = b[right_key].combine_chunks() if isinstance(b[right_key], pa.ChunkedArray) else b[right_key]
            hashes.append(hash64(np.asarray(arr.to_pylist(), dtype=object)))
        sorted_hashes = np.sort(np.concatenate(hashes)) if hashes else np.empty(0, np.uint64)
        ref = ray.put(sorted_hashes)
        missing = left.map_batches(_BroadcastAntiJoin(key, ref),
                                   batch_format="pyarrow")
        # aggregate per missing key
        partials = missing.map_batches(value_count_partials(key),
                                       batch_format="pyarrow")
        return partials.groupby(key).aggregate(Sum("n", alias_name="n"))

    # partitioned path: hash-bucket both sides, per-bucket set difference
    if bloom_prefilter:
        left_bloom = build_bloom(left, key)
        bloom_ref = ray.put(left_bloom)

        def right_filter(t: pa.Table) -> pa.Table:
            bl = ray.get(bloom_ref)
            arr = t[right_key]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if len(arr) == 0:
                return t
            h = hash64(np.asarray(arr.to_pylist(), dtype=object))
            return t.filter(pa.array(bl.contains_hashes(h)))

        right = right.map_batches(right_filter, batch_format="pyarrow")

    def tag(side: str, col: str):
        def fn(t: pa.Table) -> pa.Table:
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            h = hash64(np.asarray(arr.to_pylist(), dtype=object))
            bucket = (h % np.uint64(n_buckets)).astype(np.int64)
            return pa.table({
                "key": pc.cast(arr, pa.string()),
                "side": pa.array([side] * len(t), type=pa.string()),
                "bucket": pa.array(bucket),
            })
        return fn

    tagged = left.map_batches(tag("L", key), batch_format="pyarrow").union(
        right.map_batches(tag("R", right_key), batch_format="pyarrow"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        right_set = set(g.loc[g["side"] == "R", "key"])
        lk = g.loc[g["side"] == "L", "key"]
        miss = lk[~lk.isin(right_set)]
        vc = miss.value_counts()
        return pd.DataFrame({key: vc.index.astype(str), "n": vc.to_numpy(dtype="int64")})

    return tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
