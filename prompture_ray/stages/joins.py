"""Join strategies: broadcast hash join / semi / anti, as-of join.

The reference has no relational join — only broadcast dict lookups
(prompture/infra/model_rates.py:257-278) and the KG entity lookup
(prompture/kg/core.py:63-76). These generalize that to datasets:

- broadcast join: small side → ``ray.put`` once, vectorized lookup per
  batch (no shuffle) — the default for dimension tables.
- bucketed as-of join: both sides hash-bucketed on the key; per bucket a
  ``pd.merge_asof`` over ts-sorted frames (ray_guide as-of pattern). Used
  when the right side exceeds the broadcast threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# broadcast hash join
# ---------------------------------------------------------------------------


def broadcast_join(ds, right_df: "pd.DataFrame", on: str, how: str = "inner",
                   right_on: str | None = None):
    """Map-side join against a broadcast small side (pandas merge per
    batch). ``right_df`` ships through the object store ONCE."""
    import ray
    right_on = right_on or on
    ref = ray.put(right_df)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        return batch.merge(r, how=how, left_on=on, right_on=right_on)

    return ds.map_batches(join, batch_format="pandas")


def broadcast_semi_join(ds, keys, on: str, anti: bool = False):
    """Semi (or anti) join against a broadcast key collection."""
    import ray
    arr = np.sort(np.asarray(list(keys)))
    ref = ray.put(arr)

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(ref)
        idx = np.searchsorted(k, batch[on].to_numpy())
        idx = np.clip(idx, 0, len(k) - 1)
        present = (k[idx] == batch[on].to_numpy()) if len(k) else \
            np.zeros(len(batch), dtype=bool)
        return batch[~present] if anti else batch[present]

    return ds.map_batches(filt, batch_format="pandas")


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def broadcast_asof_join(ds, right_df: "pd.DataFrame", key: str, ts: str,
                        right_key: str | None = None, right_ts: str | None = None,
                        value_cols: list[str] | None = None,
                        inner: bool = True):
    """As-of join with a broadcast right side: for each left row, the right
    row with the greatest ``right_ts`` ≤ left ``ts`` among matching keys.

    Right side is pre-sorted per key ONCE on the driver; each batch does a
    per-key ``searchsorted`` — no shuffle. For a large right side use
    ``bucketed_asof_join``.
    """
    import ray
    right_key = right_key or key
    right_ts = right_ts or ts
    value_cols = value_cols or [c for c in right_df.columns
                                if c not in (right_key, right_ts)]
    prep: dict = {}
    for k, g in right_df.sort_values(right_ts, kind="mergesort").groupby(right_key):
        prep[k] = (g[right_ts].to_numpy(),
                   {c: g[c].to_numpy() for c in [right_ts] + value_cols})
    ref = ray.put(prep)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(ref)
        n = len(batch)
        out_cols = {c: np.full(n, None, dtype=object)
                    for c in [right_ts] + value_cols}
        matched = np.zeros(n, dtype=bool)
        tv = batch[ts].to_numpy()
        # one vectorized searchsorted per KEY GROUP, not per row
        for k, idx in batch.groupby(key, sort=False).indices.items():
            entry = table.get(k)
            if entry is None:
                continue
            ts_arr, cols = entry
            j = np.searchsorted(ts_arr, tv[idx], side="right") - 1
            ok = j >= 0
            rows, jj = idx[ok], j[ok]
            matched[rows] = True
            for c in out_cols:
                out_cols[c][rows] = cols[c][jj]
        out = batch.copy()
        for c, vals in out_cols.items():
            name = c if c not in out.columns else f"right_{c}"
            out[name] = pd.Series(vals, index=out.index)
        out = out[matched] if inner else out
        # object arrays → natural dtypes (datetime64/float/int) so the
        # output schema matches the pre-vectorization list-append form
        return out.infer_objects()

    return ds.map_batches(join, batch_format="pandas")


def bucketed_asof_join(left_ds, right_ds, key: str, ts: str,
                       right_key: str | None = None,
                       right_ts: str | None = None,
                       n_buckets: int = 32):
    """Both-sides-large as-of join: hash-bucket on the key, per-bucket
    ``pd.merge_asof`` over sorted frames (one narrow shuffle)."""
    from prompture_ray.functions.sketches import hash64
    right_key = right_key or key
    right_ts = right_ts or ts

    def tag(side, k):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            h = hash64(b[k].to_numpy())
            b["__bucket"] = (h % np.uint64(n_buckets)).astype(np.int64)
            b["__side"] = side
            return b
        return fn

    tagged = left_ds.map_batches(tag("L", key), batch_format="pandas").union(
        right_ds.map_batches(tag("R", right_key), batch_format="pandas"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["__side"] == "L"].drop(columns=["__bucket", "__side"])
        right = g[g["__side"] == "R"].drop(columns=["__bucket", "__side"])
        if left.empty or right.empty:
            return left.iloc[0:0].dropna(axis=1, how="all")
        left = left.dropna(axis=1, how="all").sort_values(ts, kind="mergesort")
        right = right.dropna(axis=1, how="all") \
                     .sort_values(right_ts, kind="mergesort")
        # unify timestamp resolutions (arrow→pandas may yield us vs ns)
        left[ts] = pd.to_datetime(left[ts]).astype("datetime64[us]")
        right[right_ts] = pd.to_datetime(right[right_ts]) \
            .astype("datetime64[us]")
        return pd.merge_asof(left, right, left_on=ts, right_on=right_ts,
                             left_by=key, right_by=right_key)

    return tagged.groupby("__bucket").map_groups(per_bucket,
                                                 batch_format="pandas")


# ---------------------------------------------------------------------------
# interval (range) join
# ---------------------------------------------------------------------------


def broadcast_interval_join(ds, right_df: "pd.DataFrame", key: str, ts: str,
                            right_key: str, right_start: str,
                            length, right_cols: list[str]):
    """1:N range join with a broadcast right side of FIXED-length
    intervals: emit one output row per (left row, right row) with the
    same key and ``right_start <= ts < right_start + length``.

    Equal-length intervals make containment a CONTIGUOUS run in the
    per-key start-sorted array (start ∈ (ts−length, ts]), so each key
    group resolves with two vectorized searchsorted calls and a repeat —
    no per-row Python, no shuffle. Variable-length intervals need the
    bucketed form (sort both sides and sweep), not this one.
    """
    import ray

    length_us = int(pd.Timedelta(length).value // 1000)  # ns → us

    def _us(arr) -> np.ndarray:
        return pd.to_datetime(arr).astype("datetime64[us]") \
            .astype("int64").to_numpy()

    prep: dict = {}
    srt = right_df.sort_values(right_start, kind="mergesort")
    for k, g in srt.groupby(right_key):
        prep[k] = (_us(g[right_start]),
                   {c: g[c].to_numpy() for c in right_cols})
    ref = ray.put(prep)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(ref)
        tv = _us(batch[ts])
        left_rows: list[np.ndarray] = []
        right_taken: dict[str, list] = {c: [] for c in right_cols}
        for k, idx in batch.groupby(key, sort=False).indices.items():
            entry = table.get(k)
            if entry is None:
                continue
            starts, cols = entry
            t = tv[idx]
            lo = np.searchsorted(starts, t - length_us, side="right")
            hi = np.searchsorted(starts, t, side="right")
            counts = hi - lo
            has = counts > 0
            if not has.any():
                continue
            # expand: left row r repeats counts[r] times; right indices
            # are the contiguous runs [lo, hi) per row
            reps = counts[has]
            left_rows.append(np.repeat(idx[has], reps))
            ridx = np.concatenate([np.arange(a, b)
                                   for a, b in zip(lo[has], hi[has])])
            for c in right_cols:
                right_taken[c].append(cols[c][ridx])
        if not left_rows:
            out = batch.iloc[0:0].copy()
            for c in right_cols:
                out[c] = pd.Series([], dtype=object)
            return out
        li = np.concatenate(left_rows)
        out = batch.iloc[li].copy()
        for c in right_cols:
            out[c] = np.concatenate(right_taken[c])
        return out.reset_index(drop=True)

    return ds.map_batches(join, batch_format="pandas")


# ---------------------------------------------------------------------------
# large-large equi-join
# ---------------------------------------------------------------------------


def bucketed_equi_join(left_ds, right_ds, key: str,
                       right_key: str | None = None,
                       how: str = "inner", n_buckets: int = 32,
                       left_cols: list[str] | None = None,
                       right_cols: list[str] | None = None):
    """Both-sides-large equi-join: hash-bucket each side on its key (ONE
    narrow shuffle over the projected columns), union, and pd.merge per
    bucket. The shuffle moves only ``left_cols``/``right_cols`` — project
    before joining, like every wide operator here. Skewed keys land in
    one bucket; salt the key upstream (stages/salted.py pattern) if a
    single key's rows exceed a worker's heap.

    Broadcast beats this whenever one side fits in the object store —
    use ``broadcast_join`` there; this is the 100-TB-both-sides form.
    """
    from prompture_ray.functions.sketches import hash64
    right_key = right_key or key

    def tag(side, k, cols):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b[cols].copy() if cols else b.copy()
            h = hash64(b[k].to_numpy())
            b["__bucket"] = (h % np.uint64(n_buckets)).astype(np.int64)
            b["__side"] = side
            return b
        return fn

    tagged = left_ds.map_batches(tag("L", key, left_cols),
                                 batch_format="pandas").union(
        right_ds.map_batches(tag("R", right_key, right_cols),
                             batch_format="pandas"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["__side"] == "L"].drop(columns=["__bucket", "__side"]) \
            .dropna(axis=1, how="all")
        right = g[g["__side"] == "R"].drop(columns=["__bucket", "__side"]) \
            .dropna(axis=1, how="all")
        if left.empty or (right.empty and how == "inner"):
            return left.iloc[0:0]
        return pd.merge(left, right, left_on=key, right_on=right_key,
                        how=how)

    return tagged.groupby("__bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
