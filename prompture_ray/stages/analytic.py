"""Analytic (ordered-window) functions per key: row_number, lag, lead,
rolling sum / mean over the last W rows.

Reference analogue: Prompture's stepwise usage accumulation walks records
in order updating running state (prompture/infra/usage.py's per-call
totals and the streaming accumulate loop, prompture/extraction/
streaming.py:215-306); these operators generalize that "ordered walk with
carried state" to per-key analytic columns over a distributed Dataset —
SQL's ``row_number() / lag / lead / sum OVER (PARTITION BY key ORDER BY
ts ROWS BETWEEN W-1 PRECEDING AND CURRENT ROW)``.

Two forms:

- ``analytic_window`` — one key = one pandas group (reference-shaped;
  breaks when a hot key's history exceeds a worker).
- ``analytic_window_bucketed`` — group size bounded by (key × coarse
  time bucket). Per-cell local analytics are computed inside bounded
  hash-partition frames with ONE vectorized pandas pass (never a frame
  per tiny cell — the repo's round-4 rule); cross-cell corrections ride
  on TINY per-cell patch rows (row-number offset, previous cell's last
  W-1 values right-aligned into W-1 int columns, next cell's first
  value) that are joined back with one ``bucketed_equi_join``. No
  driver state; every stage is a Dataset op.

Exactness: values are summed as int64 (callers pass an integer value
column — the q1 integer-units trick), so ``msum`` is association-free
and ``mavg = msum / min(rn, W)`` is ONE correctly-rounded double
division of exactly representable ints on both engine and SQL sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _plain_run(order_cols: list, value_col: str, window: int):
    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").copy()
        v = g[value_col].to_numpy().astype(np.int64)
        n = len(v)
        cum = v.cumsum()
        rn = np.arange(1, n + 1, dtype=np.int64)
        shifted = np.zeros(n, dtype=np.int64)
        if n > window:
            shifted[window:] = cum[:-window]
        msum = cum - shifted
        lag = np.full(n, np.nan)
        lead = np.full(n, np.nan)
        if n > 1:
            lag[1:] = v[:-1]
            lead[:-1] = v[1:]
        g["rn"] = rn
        g["lag_v"] = lag
        g["lead_v"] = lead
        g["msum"] = msum
        g["mavg"] = msum / np.minimum(rn, window)
        return g
    return run


def analytic_window(ds, key_col: str, order_cols: list, value_col: str,
                    window: int = 3):
    """Per-key analytic columns, one key per pandas group. ``order_cols``
    must be a unique ordering within a key (pass a tiebreaker)."""
    return ds.groupby(key_col).map_groups(
        _plain_run(order_cols, value_col, window), batch_format="pandas")


def analytic_window_bucketed(ds, key_col: str, ts_col: str, tie_col: str,
                             value_col: str, window: int = 3,
                             bucket: "pd.Timedelta | str" = "1d",
                             n_parts: int = 64):
    """Hot-key-safe analytic window (see module docstring). Equality with
    ``analytic_window`` is pinned by test, including cells smaller than
    the window (patch tails span multiple preceding cells)."""
    from prompture_ray.stages.joins import bucketed_equi_join
    from prompture_ray.functions.sketches import hash64
    assert window >= 2, "window < 2 degenerates; use window >= 2"
    bucket_us = int(pd.Timedelta(bucket).total_seconds() * 1e6)
    W = int(window)
    ptail_cols = [f"__p{j}" for j in range(1, W)]   # __p1 .. __p{W-1}

    def tag(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        b = pc.multiply(pc.divide(us, bucket_us), bucket_us)
        t = t.append_column("__bucket", b)
        key = t[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        kb = pc.binary_join_element_wise(
            pc.cast(key, pa.string()), pc.cast(b, pa.string()), "|")
        t = t.append_column("__kb", kb)
        pb = hash64(np.asarray(kb.to_pylist(), dtype=object)) \
            % np.uint64(n_parts)
        return t.append_column("__pb", pa.array(pb.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # phase 1: local analytics per (key, bucket) cell — ONE vectorized
    # pandas pass over all cells in a bounded hash-partition frame
    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__bucket", ts_col, tie_col],
                          kind="mergesort").copy()
        grp = g.groupby([key_col, "__bucket"], sort=False)
        g["__lrn"] = (grp.cumcount() + 1).astype(np.int64)
        g["__n"] = grp[value_col].transform("size").astype(np.int64)
        lcum = grp[value_col].cumsum().astype(np.int64)
        lsh = lcum.groupby(
            [g[key_col], g["__bucket"]], sort=False).shift(W) \
            .fillna(0).astype(np.int64)
        g["__lmsum"] = lcum - lsh
        g["__llag"] = grp[value_col].shift(1).astype(np.float64)
        g["__llead"] = grp[value_col].shift(-1).astype(np.float64)
        return g.drop(columns=["__pb"])

    part = tagged.groupby("__pb").map_groups(
        local, batch_format="pandas").materialize()

    # phase 2: per-cell patch rows from BOUNDARY rows only (first / last /
    # trailing W-1 rows of each cell — ≤ W+1 rows per cell reach this
    # group, so a key's footprint here is tiny even for an unbounded
    # history). Keys are folded into hash partitions and ALL keys of a
    # partition are patched in ONE vectorized pandas pass (never a frame
    # per key — the round-4 tiny-cells rule; ADVICE r4 flagged the
    # groupby(key).map_groups form this replaces).
    def boundary(b: pd.DataFrame) -> pd.DataFrame:
        lrn, n = b["__lrn"].to_numpy(), b["__n"].to_numpy()
        keep = (lrn == 1) | (lrn == n) | (lrn > n - (W - 1))
        out = b.loc[keep, [key_col, "__bucket", "__kb", "__lrn", "__n",
                           value_col]].copy()
        kpb = hash64(np.asarray(out[key_col].to_numpy(), dtype=object)) \
            % np.uint64(n_parts)
        out["__kpb"] = kpb.astype(np.int64)
        return out

    def patches_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__bucket", "__lrn"],
                          kind="mergesort")
        lrn = g["__lrn"].to_numpy().astype(np.int64)
        n = g["__n"].to_numpy().astype(np.int64)
        vals = g[value_col].to_numpy().astype(np.int64)
        # one row per cell, aligned by construction: exactly one lrn==1
        # and one lrn==n row per cell, in the same (key, bucket) order
        f_mask, l_mask = lrn == 1, lrn == n
        cells = pd.DataFrame({
            key_col: g[key_col].to_numpy()[f_mask],
            "__kb": g["__kb"].to_numpy()[f_mask],
            "__n": n[f_mask],
            "__first": vals[f_mask].astype(np.float64),
            "__last": vals[l_mask].astype(np.float64)})
        grp = cells.groupby(key_col, sort=False)
        cum = grp["__n"].cumsum().to_numpy()
        cells["__rnoff"] = (cum - cells["__n"].to_numpy()) \
            .astype(np.int64)
        cells["__prevlast"] = grp["__last"].shift(1).to_numpy()
        cells["__nextfirst"] = grp["__first"].shift(-1).to_numpy()
        plen = np.minimum(cells["__rnoff"].to_numpy(), W - 1) \
            .astype(np.int64)
        cells["__plen"] = plen
        # ptail columns from the global "tail stream": the trailing
        # min(n, W-1) rows of every cell, in (key, bucket, lrn) order.
        # The last W-1 stream entries before a cell ARE the last W-1
        # values of the key's full prefix (each prefix value lives in
        # its own cell's trailing W-1). Cell c's stream prefix ends at
        # global index e = cumsum(tail_n) - tail_n; __pj = stream
        # [e - W + j], valid only when j >= W - plen — the mask also
        # keeps the index inside this key's own stream run.
        tv = vals[lrn > n - (W - 1)]
        tn = np.minimum(cells["__n"].to_numpy(), W - 1)
        e = np.cumsum(tn) - tn
        for j, cname in enumerate(ptail_cols, start=1):
            idx = np.clip(e - W + j, 0, max(len(tv) - 1, 0))
            ok = j >= (W - plen)
            cells[cname] = np.where(
                ok, tv[idx] if len(tv) else 0, 0).astype(np.int64)
        return cells.drop(columns=[key_col, "__n", "__first", "__last"])

    patch_ds = part.map_batches(boundary, batch_format="pandas") \
        .groupby("__kpb").map_groups(patches_part,
                                     batch_format="pandas") \
        .materialize()

    part_cols = [c for c in part.schema().names if c != "__bucket"]
    joined = bucketed_equi_join(
        part, patch_ds, key="__kb",
        left_cols=part_cols,
        right_cols=["__kb", "__rnoff", "__prevlast", "__plen",
                    "__nextfirst"] + ptail_cols)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        lrn = b["__lrn"].to_numpy().astype(np.int64)
        n = b["__n"].to_numpy().astype(np.int64)
        rn = lrn + b["__rnoff"].to_numpy().astype(np.int64)
        plen = b["__plen"].to_numpy().astype(np.int64)
        lag = np.where(lrn == 1, b["__prevlast"].to_numpy(),
                       b["__llag"].to_numpy())
        lead = np.where(lrn == n, b["__nextfirst"].to_numpy(),
                        b["__llead"].to_numpy())
        msum = b["__lmsum"].to_numpy().astype(np.int64)
        need = np.maximum(W - lrn, 0)
        take = np.minimum(need, plen)
        extra = np.zeros(len(b), dtype=np.int64)
        for j, cname in enumerate(ptail_cols, start=1):
            pj = b[cname].to_numpy().astype(np.int64)
            extra += np.where(take >= (W - j), pj, 0)
        msum = msum + extra
        b["rn"] = rn
        b["lag_v"] = lag
        b["lead_v"] = lead
        b["msum"] = msum
        b["mavg"] = msum / np.minimum(rn, W)
        drop = (["__kb", "__lrn", "__n", "__lmsum", "__llag", "__llead",
                 "__rnoff", "__prevlast", "__plen", "__nextfirst"]
                + ptail_cols)
        return b.drop(columns=[c for c in drop if c in b.columns])

    return joined.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# top-k rows per group (training-data selection per domain/language —
# SQL's row_number() OVER (PARTITION BY key ORDER BY ...) <= k)
# ---------------------------------------------------------------------------
def top_k_per_group(ds, key_col: str, order_col: str, k: int,
                    tie_col: str, ascending: bool = False,
                    n_parts: int = 64):
    """Keep the top ``k`` rows of every group, ordered by ``order_col``
    (descending by default) with ``tie_col`` ascending as the
    deterministic tie-break. Returns the surviving rows (all input
    columns) plus an ``rk`` rank column (1-based).

    Scale shape: a per-batch PARTIAL top-k (one vectorized sort +
    ``groupby.head(k)`` per batch — any row outside its batch-local
    top k can't be in the global top k) shrinks the shuffle to
    <= k rows per (key, batch); the final pass groups partials by
    ``hash64(key) % n_parts`` and re-ranks every key of the partition
    in ONE vectorized pandas pass (never a frame per key). No global
    sort, no driver state.
    """
    from prompture_ray.functions.sketches import hash64

    by = [key_col, order_col, tie_col]
    asc = [True, ascending, True]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort")
        return b.groupby(key_col, sort=False).head(k)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        kv = b[key_col].to_numpy()
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        b = b.copy()
        b["__pb"] = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return b

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=asc, kind="mergesort")
        g = g.groupby(key_col, sort=False).head(k)
        g["rk"] = g.groupby(key_col, sort=False).cumcount() + 1
        g["rk"] = g["rk"].astype("int64")
        return g.drop(columns=["__pb"])

    return ds.map_batches(partial, batch_format="pandas") \
        .map_batches(tag, batch_format="pandas") \
        .groupby("__pb").map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# percent_rank per key (per-domain score normalization) — SQL's
# percent_rank() OVER (PARTITION BY key ORDER BY value)
# ---------------------------------------------------------------------------
def percent_rank_by_key(ds, key_col: str, value_col: str,
                        out_col: str = "pr",
                        broadcast_max: int = 20_000_000):
    """Append ``out_col`` = (rank-1)/(n_key-1) with rank = the min rank
    over ties (SQL RANK), 0.0 for single-row keys. IEEE-exact against a
    SQL ``percent_rank()`` oracle: both sides compute the SAME single
    correctly-rounded double division of exactly representable ints —
    no rounding step anywhere.

    Scale shape: per-batch (key, value, count) partials fold into ONE
    narrow shuffle of the DISTINCT (key, value) table — inherently
    compressed (|keys| x |distinct values|, independent of row count).
    That table is collected once (must fit ``broadcast_max`` rows — a
    genuinely huge distinct set wants a pre-bucketing the caller can do
    by quantizing ``value_col``), cumsum'd per key vectorized, and
    broadcast as sorted hash arrays; every batch then looks ranks up by
    searchsorted. Rows themselves NEVER shuffle. Identity of (key,
    value) cells is hash-mixed (64-bit; ~n^2/2^64 collision odds)."""
    import ray
    from ray.data.aggregate import Sum
    from prompture_ray.functions.sketches import hash64

    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _comb(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
        hk = hash64(keys).astype(np.uint64)
        hv = hash64(vals.astype(np.int64)).astype(np.uint64)
        return ((hk * _GOLD) ^ hv).view(np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([key_col, value_col], sort=False) \
            .size().rename("c").reset_index()
        g["c"] = g["c"].astype("int64")
        return g

    cells = ds.map_batches(partial, batch_format="pandas") \
        .groupby([key_col, value_col]).aggregate(Sum("c", alias_name="c")) \
        .materialize()
    n_cells = cells.count()
    if n_cells > broadcast_max:
        raise RuntimeError(
            f"distinct (key, value) table too large to broadcast "
            f"({n_cells} > {broadcast_max}); quantize {value_col} or "
            f"raise broadcast_max")
    cdf = cells.to_pandas().sort_values([key_col, value_col],
                                        kind="mergesort",
                                        ignore_index=True)
    c = cdf["c"].to_numpy().astype(np.int64)
    keys = cdf[key_col].to_numpy()
    if keys.dtype.kind not in "iu":
        keys = np.asarray(keys, dtype=object)
    new_key = np.ones(len(cdf), dtype=bool)
    if len(cdf) > 1:
        new_key[1:] = keys[1:] != keys[:-1]
    # rank of a cell = 1 + rows of the same key with smaller value:
    # (global rows before the cell) - (global rows before its key),
    # the latter propagated from each key's first cell by a segmented
    # maximum.accumulate (csum-c is non-decreasing)
    csum = np.cumsum(c)
    seg_start_total = np.maximum.accumulate(
        np.where(new_key, csum - c, np.int64(np.iinfo(np.int64).min)))
    rank = (csum - c) - seg_start_total + 1
    key_idx = np.cumsum(new_key) - 1
    n_per_key = np.bincount(key_idx, weights=c).astype(np.int64)
    n_of_cell = n_per_key[key_idx]
    comb = _comb(keys, cdf[value_col].to_numpy())
    order = np.argsort(comb, kind="mergesort")
    ref = ray.put((comb[order], rank[order].astype(np.int64),
                   n_of_cell[order]))

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        combs, ranks, ns = ray.get(ref)
        kv = b[key_col].to_numpy()
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        cb = _comb(kv, b[value_col].to_numpy())
        i = np.searchsorted(combs, cb)
        r, n = ranks[i], ns[i]
        pr = np.where(n > 1, (r - 1) / np.maximum(n - 1, 1), 0.0)
        out = b.copy()
        out[out_col] = pr
        return out

    return ds.map_batches(attach, batch_format="pandas")


def global_row_number(ds, order_col: str, out_col: str = "rownum",
                      bucket: "str" = "1s"):
    """0-based global row number in ``order_col`` order — the
    zipWithIndex primitive Ray Data lacks (beyond the reference; used
    for stable corpus ordering / resumable offsets). ``order_col`` must
    be an int64 key; ties are assigned unique but layout-dependent
    numbers, so pass a duplicate-free key for determinism (ids).

    Distribution is the pack_sequences shape: ONE constant-key run of
    ``windows.running_aggregate_bucketed`` (phase-bounded cells,
    distributed offset join, no driver state) with value 1 — the
    running count minus one is the row number. ``bucket`` bounds cell
    size in order_col units ('1s' = 1M per cell for dense id spaces)."""
    import pandas as pd
    from prompture_ray.stages.windows import running_aggregate_bucketed

    # integer passthrough columns widen to float64 across the pandas
    # block unification inside the running-aggregate join (exact for
    # values < 2^53 — ids/counters; pack_sequences re-casts the same
    # way). Capture them up front to restore dtypes. NB .schema() on a
    # non-trivial lineage executes it — pass a plain projected read.
    int_cols = []
    sch = ds.schema()
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            if pa.types.is_integer(t):
                int_cols.append(n)
        else:
            try:
                if np.issubdtype(np.dtype(t), np.integer):
                    int_cols.append(n)
            except TypeError:
                pass

    def prep(t: pa.Table) -> pa.Table:
        ids = t[order_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.cast(pa.int64())
        t = t.append_column("__k", pa.array(
            np.zeros(t.num_rows, dtype=np.int64)))
        t = t.append_column("__ts", ids.cast(pa.timestamp("us")))
        return t.append_column("__one", pa.array(
            np.ones(t.num_rows, dtype=np.int64)))

    # Ray groupby/join costs follow the INPUT block count (round-5
    # fact; a 1500-block 9M-row input ran >20 min where 128 blocks
    # take ~1 min) — coalesce to a bounded count first. count() on a
    # non-trivial lineage executes it: pass a plain projected read or
    # a materialized Dataset.
    n_rows = ds.count()
    ds = ds.repartition(max(64, min(1024, n_rows // 500_000 + 1)))

    run = running_aggregate_bucketed(
        ds.map_batches(prep, batch_format="pyarrow"),
        "__k", "__ts", "__one", bucket=bucket)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out_col] = (b["running_sum"].to_numpy().astype(np.int64) - 1)
        for c in int_cols:
            if c in b.columns:
                b[c] = b[c].to_numpy().astype(np.int64)
        return b.drop(columns=["__k", "__ts", "__one", "running_sum"])

    return run.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# forward fill (LOCF) per key — SQL's last_value(x IGNORE NULLS) OVER
# (PARTITION BY key ORDER BY ts, tie ROWS UNBOUNDED PRECEDING)
# ---------------------------------------------------------------------------
def forward_fill(ds, key_col: str, ts_col: str, tie_col: str,
                 value_cols: list, n_parts: int = 64,
                 shuffle_blocks: int = 128):
    """Last-observation-carried-forward per key: every null in
    ``value_cols`` takes the most recent non-null value of the same key
    in (``ts_col``, ``tie_col``) order; leading nulls stay null — the
    sensor/stream gap-repair primitive.

    Scale shape: ONE hash64(key) % n_parts row shuffle (every key lands
    wholly in one partition — the userpath pattern), then one vectorized
    sort + ``groupby.ffill`` pandas pass per partition; never a frame
    per key, no driver state. Auto-size ``n_parts`` ≈ rows / 5M for
    huge inputs. Int64 value columns travel as nullable Int64 inside
    the partition pass (``types_mapper``), so hash-magnitude payloads
    are NOT widened to float64 (the round-4 arrow-union lesson).

    ``shuffle_blocks`` bounds the groupby's input block count (round-5
    pathology: Ray groupby sort cost follows INPUT blocks — the
    1500-fragment 9M-row rehearsal measured 128x superlinear before
    this coalesce). Size ≈ rows / 500k beyond ~64M rows."""
    from prompture_ray.functions.sketches import hash64

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    _int64 = {pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int64Dtype()}

    def fill(g: pa.Table) -> pd.DataFrame:
        df = g.to_pandas(types_mapper=_int64.get)
        df = df.sort_values([key_col, ts_col, tie_col],
                            kind="mergesort")
        df[value_cols] = df.groupby(key_col, sort=False)[value_cols] \
            .ffill()
        return df.drop(columns=["__pb"])

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(fill, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# generic per-key lag/lead shift — SQL's lag(col, k) / lead(col, k)
# OVER (PARTITION BY key ORDER BY ts, tie)
# ---------------------------------------------------------------------------
def lag_shift(ds, key_col: str, ts_col: str, tie_col: str,
              cols: list, shifts=(1,), n_parts: int = 64,
              shuffle_blocks: int = 128):
    """Append ``{col}_lag{k}`` (k > 0) / ``{col}_lead{k}`` (k < 0)
    columns: the value of ``col`` k rows earlier/later within the same
    ``key_col`` group in (``ts_col``, ``tie_col``) order; out-of-range
    rows get null. Works for any column dtype (strings shift as
    objects, ints travel as nullable Int64 so hash-magnitude payloads
    never widen to float64 — the round-4 arrow-union lesson).

    Reference analogue: the ordered accumulate walk of
    prompture/extraction/streaming.py:215-306 carries the PREVIOUS
    snapshot per stream to diff against — this is that "previous row
    per key" primitive as a distributed analytic column.

    Scale shape: ONE hash64(key) % n_parts row shuffle (every key lands
    wholly in one partition — the userpath/forward_fill pattern), then
    one vectorized sort + ``groupby.shift`` pandas pass per partition;
    never a frame per key, no driver state. Auto-size ``n_parts`` ≈
    rows / 5M for huge inputs; a single pathologically hot key bounds a
    partition (use analytic_window_bucketed when one key's history
    exceeds a worker). ``shuffle_blocks`` bounds the groupby's input
    block count (round-5 pathology: groupby sort cost follows INPUT
    blocks); size ≈ rows / 500k beyond ~64M rows."""
    from prompture_ray.functions.sketches import hash64

    shifts = tuple(int(k) for k in shifts)
    if any(k == 0 for k in shifts):
        raise ValueError("lag_shift: shift 0 is the identity")

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    _int64 = {pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int64Dtype()}

    def shift_part(g: pa.Table) -> pd.DataFrame:
        df = g.to_pandas(types_mapper=_int64.get)
        df = df.sort_values([key_col, ts_col, tie_col],
                            kind="mergesort")
        grp = df.groupby(key_col, sort=False)[list(cols)]
        for k in shifts:
            name = f"_lag{k}" if k > 0 else f"_lead{-k}"
            shifted = grp.shift(k)
            for c in cols:
                df[f"{c}{name}"] = shifted[c]
        return df.drop(columns=["__pb"])

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(shift_part, batch_format="pyarrow")


def suppress_bursts(ds, key_col: str, ts_col: str, tie_col: str,
                    min_gap: int, n_parts: int = 64,
                    shuffle_blocks: int = 128):
    """Burst / recrawl suppression: drop a row when the PREVIOUS row of
    the same ``key_col`` (in ``ts_col``, ``tie_col`` order) is less than
    ``min_gap`` ``ts_col`` units earlier — the crawl-staple "skip a
    refetch of the same content hash within T" filter. The first row of
    every key is always kept; the gap test is against the previous
    OCCURRENCE (SQL's ``lag``), not the previous KEPT row, so the
    semantics stay one-pass/vectorizable and SQL-expressible. ``ts_col``
    must be integer (epoch-µs); comparisons are exact int64.

    Scale shape: the lag_shift single-shuffle pattern (one
    hash64(key) % n_parts row shuffle, one vectorized sort +
    groupby.shift + int compare per partition); ``shuffle_blocks``
    bounds the groupby's input block count (round-5 pathology)."""
    from prompture_ray.functions.sketches import hash64

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    _int64 = {pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int64Dtype()}

    def keep_part(g: pa.Table) -> pd.DataFrame:
        df = g.to_pandas(types_mapper=_int64.get)
        df = df.sort_values([key_col, ts_col, tie_col],
                            kind="mergesort")
        prev = df.groupby(key_col, sort=False)[ts_col].shift(1)
        ts = df[ts_col].to_numpy(dtype=np.int64)
        pv = prev.to_numpy(dtype="float64", na_value=np.nan)
        first = np.isnan(pv)
        gap_ok = np.zeros(len(df), dtype=bool)
        if (~first).any():
            # ts values are epoch-µs (< 2^53): the float64 detour of
            # the nullable shift is exact here
            gap_ok[~first] = (ts[~first] - pv[~first].astype(np.int64)
                              ) >= int(min_gap)
        return df[first | gap_ok].drop(columns=["__pb"])

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(keep_part, batch_format="pyarrow")


def time_weighted_avg(ds, key_col: str, ts_col: str, tie_col: str,
                      val_col: str, n_parts: int = 64,
                      shuffle_blocks: int = 128):
    """Time-weighted average per key — each value weighted by how long
    it held (until the key's next event; the last event holds for zero
    time): ``twa = Σ v_i·(t_{i+1}−t_i) / (t_last − t_first)`` — the
    metering / sensor / price-feed aggregation primitive. Returns
    ``(key, num, den, twa)``; keys whose span is zero (single event or
    all-equal timestamps) are dropped, mirroring SQL ``HAVING
    max(t) > min(t)``.

    Exactness: with integer values and int64 µs timestamps, ``num``
    and ``den`` are exact int64 (caller's bound: Σ v·dt < 2^63) and
    ``twa`` is ONE correctly-rounded double division — a SQL replay
    (lead() window + SUM) is bit-identical with no rounding.

    Scale shape: the lag_shift pattern — ONE hash64(key) % n_parts row
    shuffle, one vectorized sort + boundary-masked diff pass per
    partition; never a frame per key, no driver state."""
    from prompture_ray.functions.sketches import hash64

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, tie_col], kind="mergesort")
        k = g[key_col].to_numpy()
        t = g[ts_col].to_numpy().astype(np.int64)
        v = g[val_col].to_numpy().astype(np.int64)
        if not len(k):
            return pd.DataFrame({key_col: k, "num": t, "den": t,
                                 "twa": np.empty(0)})
        same = np.r_[k[1:] == k[:-1], False]   # row has a successor
        dt = np.where(same, np.r_[t[1:], np.int64(0)] - t, np.int64(0))
        part = pd.DataFrame({key_col: k, "__vd": v * dt, "__t": t})
        agg = part.groupby(key_col, sort=False).agg(
            num=("__vd", "sum"), mn=("__t", "min"), mx=("__t", "max"))
        agg = agg[agg["mx"] > agg["mn"]]
        den = (agg["mx"] - agg["mn"]).to_numpy().astype(np.int64)
        num = agg["num"].to_numpy().astype(np.int64)
        return pd.DataFrame({key_col: agg.index.to_numpy(),
                             "num": num, "den": den,
                             "twa": num / den})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(fold, batch_format="pandas")


def rolling_anomaly(ds, key_col: str, ts_col: str, tie_col: str,
                    val_col: str, window: int, k: int,
                    min_n: int = 2, n_parts: int = 64,
                    shuffle_blocks: int = 128):
    """Rolling z-score anomaly flags per key WITHOUT floats: over the
    trailing window of ``window`` rows (current row + window−1
    preceding, per key in (ts, tie) order), flag
    ``|x − mean| > k·std`` via the cross-multiplied ALL-INTEGER test

        (n·x − s)² > k²·(n·s2 − s²)

    (n = actual window row count, s = Σv, s2 = Σv² — population std;
    rows with n < ``min_n`` are never flagged). Appends ``n_win``,
    ``s_win``, ``s2_win``, ``is_anomaly``. Exactness bound (caller
    contract): window·|v|² < 2^53 (pandas rolling sums are float64
    internally) and (n·|x|+s)² < 2^63 for the comparison — quantized
    telemetry/score columns satisfy both by miles; a SQL window-frame
    replay is then bit-identical with NO float anywhere.

    Scale shape: the lag_shift pattern — ONE hash64(key) % n_parts row
    shuffle, one vectorized sort + groupby-rolling pass per
    partition."""
    from prompture_ray.functions.sketches import hash64

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, tie_col],
                          kind="mergesort").reset_index(drop=True)
        v = g[val_col].to_numpy().astype(np.int64)
        grp = g.groupby(key_col, sort=False)[val_col]
        roll = grp.rolling(window=window, min_periods=1)
        s = roll.sum().reset_index(level=0, drop=True) \
            .sort_index().to_numpy().astype(np.int64)
        n = roll.count().reset_index(level=0, drop=True) \
            .sort_index().to_numpy().astype(np.int64)
        g2 = g.assign(__v2=v * v).groupby(key_col, sort=False)["__v2"]
        s2 = g2.rolling(window=window, min_periods=1).sum() \
            .reset_index(level=0, drop=True) \
            .sort_index().to_numpy().astype(np.int64)
        lhs = n * v - s
        flag = (lhs * lhs > k * k * (n * s2 - s * s)) & (n >= min_n)
        out = g.drop(columns=["__pb"])
        out["n_win"] = n
        out["s_win"] = s
        out["s2_win"] = s2
        out["is_anomaly"] = flag
        return out

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(fold, batch_format="pandas")


def cusum_flags(ds, key_col: str, ts_col: str, tie_col: str,
                val_col: str, target_k: int, threshold_h: int,
                n_parts: int = 64, shuffle_blocks: int = 128):
    """One-sided CUSUM change-point detection per key WITHOUT floats:
    the classic recursive statistic ``S_t = max(0, S_{t-1} + v_t − k)``
    (Page's test; S_0 = 0) flags a sustained upward shift of the series
    above target ``k`` when ``S_t > h``. The recursion is NOT a prefix
    sum, but it has an exact closed form over prefix sums

        S_t = P_t − min(0, min_{j≤t} P_j),   P_t = Σ_{i≤t} (v_i − k)

    so the per-partition pass is one ``cumsum`` + one ``cummin`` —
    fully vectorized, integer-exact (caller contract: Σ|v−k| per key
    < 2^63), and bit-identically replayable in SQL as
    ``SUM(v−k) OVER (...)`` and ``MIN(P) OVER (...)``. Appends ``cusum``
    (= S_t) and ``is_shift`` (S_t > h).

    Reference analogue: the carried-accumulator walk of
    prompture/extraction/streaming.py:215-306 (running state per
    stream); this is that walk as a distributed analytic with the
    max-recursion algebraically removed.

    Scale shape: the lag_shift pattern — ONE hash64(key) % n_parts row
    shuffle (a key's whole history lands in one partition), one
    vectorized sort + grouped cumsum/cummin pandas pass per partition;
    ``shuffle_blocks`` bounds the groupby's input block count."""
    from prompture_ray.functions.sketches import hash64

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, tie_col],
                          kind="mergesort").reset_index(drop=True)
        d = g[val_col].to_numpy().astype(np.int64) - int(target_k)
        grp = g.assign(__d=d).groupby(key_col, sort=False)["__d"]
        p = grp.cumsum().to_numpy().astype(np.int64)
        m = g.assign(__p=p).groupby(key_col, sort=False)["__p"] \
            .cummin().to_numpy().astype(np.int64)
        s = p - np.minimum(m, 0)
        out = g.drop(columns=["__pb"])
        out["cusum"] = s
        out["is_shift"] = s > int(threshold_h)
        return out

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(fold, batch_format="pandas")


def fir_smooth(ds, key_col: str, ts_col: str, tie_col: str,
               val_col: str, taps: int = 8, n_parts: int = 64,
               shuffle_blocks: int = 128):
    """Exponentially-shaped FIR smoothing per key with DYADIC weights —
    the exactness-preserving stand-in for a recursive EWMA (whose state
    accumulates unbounded fractional bits and stops being
    SQL-replayable): the smoothed value over the trailing ``taps`` rows
    is

        y_t = v_t/2 + v_{t−1}/4 + … + v_{t−taps+2}/2^{taps−1}
              + v_{t−taps+1}/2^{taps−1}

    (last weight repeated so the kernel sums to EXACTLY 1). Every term
    is an exact dyadic double (weights are powers of two; integer
    values keep < 53 significant bits for |v| < 2^{53−taps}), so every
    intermediate partial sum is exact and the result is bit-identical
    to a SQL ``lag()`` replay in ANY association order. Rows with fewer
    than ``taps−1`` predecessors in their key get a null ``fir``.
    Appends ``fir``.

    Built on :func:`lag_shift` (one row shuffle, vectorized grouped
    shift per partition); the weighted combine is a pure numpy pass."""
    if taps < 2:
        raise ValueError("fir_smooth: taps must be >= 2")
    shifts = tuple(range(1, taps))
    lagged = lag_shift(ds, key_col, ts_col, tie_col, [val_col],
                       shifts=shifts, n_parts=n_parts,
                       shuffle_blocks=shuffle_blocks)

    def finish(t: pa.Table) -> pa.Table:
        n = t.num_rows
        v = t[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = v * 0.5
        ok = np.ones(n, dtype=bool)
        for j in shifts:
            col = t[f"{val_col}_lag{j}"].combine_chunks()
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            ok &= valid
            lv = col.to_numpy(zero_copy_only=False)
            w = 2.0 ** -(j + 1) if j < taps - 1 else 2.0 ** -(taps - 1)
            lvf = np.where(valid, lv, 0).astype(np.float64)
            y = y + lvf * w
        drop = [f"{val_col}_lag{j}" for j in shifts]
        out = t.drop_columns(drop)
        return out.append_column(
            "fir", pa.array(np.where(ok, y, np.nan), type=pa.float64(),
                            mask=~ok))

    return lagged.map_batches(finish, batch_format="pyarrow")


def ntile_by_key(ds, key_col: str, order_col: str, n_tiles: int,
                 n_parts: int = 64, shuffle_blocks: int = 128):
    """SQL ``NTILE(n)`` per key: rows of each key are ranked by
    ``order_col`` and dealt into ``n_tiles`` buckets, the first
    ``n mod k`` buckets taking one extra row (the ANSI fill). With
    ``q = n // k`` and ``r = n mod k`` the bucket of 1-based row-number
    ``rn`` is the exact integer formula

        rn ≤ r·(q+1)  →  (rn−1) // (q+1) + 1
        otherwise     →  r + (rn−1−r·(q+1)) // q + 1

    Caller contract: ``order_col`` values are DISTINCT within a key
    (plant a unique tie-breaker otherwise) — NTILE over ties is
    tie-order-dependent and not oracle-checkable. Appends ``tile``.

    Scale shape: the lag_shift pattern — one hash64(key) % n_parts row
    shuffle, one vectorized sort + grouped cumcount/size pass per
    partition."""
    from prompture_ray.functions.sketches import hash64
    k = int(n_tiles)
    if k < 1:
        raise ValueError("ntile_by_key: n_tiles must be >= 1")

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col],
                          kind="mergesort").reset_index(drop=True)
        grp = g.groupby(key_col, sort=False)
        rn = grp.cumcount().to_numpy().astype(np.int64) + 1
        n = grp[order_col].transform("size").to_numpy() \
            .astype(np.int64)
        q, r = n // k, n % k
        head = rn <= r * (q + 1)
        tile = np.where(
            head, (rn - 1) // np.maximum(q + 1, 1) + 1,
            r + (rn - 1 - r * (q + 1)) // np.maximum(q, 1) + 1)
        out = g.drop(columns=["__pb"])
        out["tile"] = tile.astype(np.int64)
        return out

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(fold, batch_format="pandas")


def max_drawdown_by_key(ds, key_col: str, ts_col: str, tie_col: str,
                        val_col: str, n_parts: int = 64,
                        shuffle_blocks: int = 128):
    """Maximum drawdown per key over the cumulative series
    ``P_t = Σ_{i≤t} v_i`` (ts, tie order): ``max_t (max_{j≤t} P_j −
    P_t)`` — the largest peak-to-trough drop, the classic risk /
    degradation summary for telemetry. Pure int64 (cumsum + cummax +
    grouped max), SQL-replayable bit-identically via cumulative
    SUM/MAX windows. Returns one row per key: (key, max_drawdown,
    n). Keys with one row get 0.

    Scale shape: the lag_shift pattern — ONE hash64(key) % n_parts
    row shuffle, one vectorized sort + grouped cumsum/cummax pass per
    partition; output is |keys| rows."""
    from prompture_ray.functions.sketches import hash64

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, tie_col],
                          kind="mergesort").reset_index(drop=True)
        grp = g.groupby(key_col, sort=False)
        p = grp[val_col].cumsum().to_numpy().astype(np.int64)
        pk = g.assign(__p=p).groupby(key_col, sort=False)["__p"] \
            .cummax().to_numpy().astype(np.int64)
        dd = pk - p
        out = g.assign(__dd=dd).groupby(key_col, sort=False)["__dd"] \
            .max().rename("max_drawdown").reset_index()
        out["n"] = grp.size().to_numpy().astype(np.int64)
        out["max_drawdown"] = out["max_drawdown"].astype("int64")
        return out.drop(columns=["__pb"], errors="ignore")

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(fold, batch_format="pandas")


def unpivot(ds, id_cols: list, value_cols: list,
            var_col: str = "variable", val_col: str = "value"):
    """Wide→long reshape (SQL UNPIVOT / pandas melt): one output row
    per (input row × value column), carrying ``id_cols`` through,
    with the source column name in ``var_col`` and its value cast to
    a common type in ``val_col``. Pure per-batch Arrow rebuild —
    ZERO shuffle, zero copy of the id columns beyond the k-fold
    repeat; the inverse of rollup.pivot_counts' wide layout."""
    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = len(value_cols)
        cols = {}
        for c in id_cols:
            a = t[c]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            cols[c] = pa.concat_arrays([a] * k)
        names = []
        for c in value_cols:
            names += [c] * n
        cols[var_col] = pa.array(np.asarray(names, dtype=object),
                                 type=pa.string())
        vals = []
        out_type = None
        for c in value_cols:
            a = t[c]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            if out_type is None:
                out_type = a.type
            vals.append(a.cast(out_type) if a.type != out_type else a)
        cols[val_col] = pa.concat_arrays(vals)
        return pa.table(cols)

    return ds.map_batches(melt, batch_format="pyarrow")


def longest_streak(ds, key_col: str, ts_col: str, tie_col: str,
                   val_col: str, n_parts: int = 64,
                   shuffle_blocks: int = 128):
    """Longest run of CONSECUTIVE EQUAL values per key in (ts, tie)
    order (gaps-and-islands: the engagement-streak / repeated-status
    audit). Returns one row per key: ``(key, streak, streak_val)`` —
    the maximal run length and the value of that run; ties between
    equal-length runs break toward the EARLIEST run (deterministic,
    SQL-replayable via min-island-start ordering). Pure integer.

    Scale shape: the lag_shift pattern — ONE hash64(key) % n_parts
    row shuffle, one vectorized sort + boundary-cumsum pandas pass
    per partition; output is |keys| rows."""
    from prompture_ray.functions.sketches import hash64

    def tag(t: pa.Table) -> pa.Table:
        kv = t[key_col].to_numpy(zero_copy_only=False)
        if kv.dtype.kind not in "iu":
            kv = np.asarray(kv, dtype=object)
        pb = (hash64(kv) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb, type=pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, tie_col],
                          kind="mergesort").reset_index(drop=True)
        keys = g[key_col].to_numpy()
        if keys.dtype.kind not in "iu":
            keys = np.asarray(keys, dtype=object)
        vals = g[val_col].to_numpy()
        if vals.dtype.kind not in "iu":
            vals = np.asarray(vals, dtype=object)
        new_key = np.ones(len(g), dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        new_run = new_key.copy()
        new_run[1:] |= vals[1:] != vals[:-1]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_start = np.flatnonzero(new_run)
        run_key_idx = (np.cumsum(new_key) - 1)[run_start]
        # per key: longest run, earliest on ties — lexsort by
        # (key, -len, start) and take the first run of each key
        order = np.lexsort((run_start, -run_len, run_key_idx))
        rk = run_key_idx[order]
        first = np.r_[True, rk[1:] != rk[:-1]]
        best = order[first]
        out = pd.DataFrame({
            key_col: keys[run_start[best]],
            "streak": run_len[best].astype(np.int64),
            "streak_val": vals[run_start[best]]})
        return out

    return ds.map_batches(tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("__pb").map_groups(fold, batch_format="pandas")
