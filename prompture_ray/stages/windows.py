"""Stream-shaped operators over an ordered, partitioned log (the `events`
table): tumbling windows, session windows, running aggregates.

Ray Data has no event-time window primitive (ray_guide: treat the input as
a partitioned log; windows = ``groupby(key).map_groups`` over the sorted
group). The ORDERING ASSUMPTION for every operator here: rows of one key
fit in one group and are sorted by ``ts_col`` inside the UDF — correctness
does not depend on input order, only on per-key grouping.

Reference anchor: the reference's only streaming concern is in-order
incremental parsing of one stream (prompture/extraction/streaming.py:272-297);
these operators generalize that to keyed event-time logs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(ds, ts_col: str, keys: list[str], unit: str = "hour",
                    agg_col: str | None = None):
    """Tumbling event-time window: floor ts to the unit inside map_batches
    (no shuffle), then one grouped aggregate."""
    from ray.data.aggregate import Count, Sum

    def bucket(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t[ts_col], unit=unit)
        cols = {k: t[k] for k in keys}
        cols["window"] = w
        if agg_col:
            cols[agg_col] = t[agg_col]
        return pa.table(cols)

    aggs = [Count(alias_name="n")]
    if agg_col:
        aggs.append(Sum(agg_col, alias_name=f"sum_{agg_col}"))
    return ds.map_batches(bucket, batch_format="pyarrow") \
             .groupby(keys + ["window"]).aggregate(*aggs)


def session_windows(ds, key_col: str, ts_col: str,
                    gap: "pd.Timedelta | str" = "30min"):
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap``. Returns one row per session:
    (key, session_id, session_start, session_end, n_events)."""
    gap_td = pd.Timedelta(gap)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col]
        new = ts.diff() > gap_td
        sid = new.cumsum()
        out = g.groupby(sid).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"))
        out = out.reset_index(drop=True)
        out.insert(0, key_col, g[key_col].iloc[0])
        out.insert(1, "session_id", np.arange(len(out), dtype=np.int64))
        return out

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")


def session_counts(ds, key_col: str, ts_col: str,
                   gap: "pd.Timedelta | str" = "30min"):
    """(key, n_sessions, n_events) — compact sessionization rollup."""
    gap_td = pd.Timedelta(gap)

    def count_sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].sort_values(kind="mergesort")
        n_sessions = int((ts.diff() > gap_td).sum()) + 1
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "n_sessions": [n_sessions],
                             "n_events": [len(g)]})

    return ds.groupby(key_col).map_groups(count_sessions,
                                          batch_format="pandas")


def running_aggregate(ds, key_col: str, ts_col: str, value_col: str):
    """Per-key running sum ordered by ts (reference-style stepwise
    accumulation, core.py:1381-1440, keyed + distributed)."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort").copy()
        g["running_sum"] = g[value_col].cumsum()
        return g

    return ds.groupby(key_col).map_groups(run, batch_format="pandas")


def running_aggregate_bucketed(ds, key_col: str, ts_col: str,
                               value_col: str,
                               bucket: "pd.Timedelta | str" = "1d"):
    """Hot-key-safe per-key running sum: the plain ``running_aggregate``
    holds one key's entire history in a single pandas group. This form
    bounds group size by (key × coarse time bucket):

    phase 1 — groupby a hash PARTITION of (key, bucket) (bounded frames,
    ~thousands of (key, bucket) cells per frame) and compute every
    cell's local cumsum with ONE vectorized pandas groupby-cumsum — no
    frame-per-cell overhead (the naive groupby((key, bucket)) form paid
    a pandas frame per tiny cell and was ~10× slower);
    phase 2 — per-(key, bucket) sums via a vectorized partial + sorted
    aggregate, then per-key exclusive prefix over those few summary
    rows → an offset per (key, bucket);
    phase 3 — hash-bucketed join of data rows × offsets on the combined
    (key, bucket) id, then one vectorized add. No driver state at any
    phase — the offsets stay a Dataset.

    Ties within (key, ts) accumulate in input order inside a bucket like
    the plain form. Equality against ``running_aggregate`` is pinned by
    test; the oracle is a SQL window cumsum.

    Block-count hazard (round-5): the phase-1 groupby and the phase-3
    join inherit the INPUT's block count — a 1500-block input made a
    9M-row run >20x slower than a 128-block one. Callers with
    many-fragment inputs should coalesce first (``repartition(
    max(64, rows/500k))`` — see ``analytic.global_row_number``)."""
    from ray.data.aggregate import Sum
    from prompture_ray.stages.joins import bucketed_equi_join
    from prompture_ray.functions.sketches import hash64
    bucket_td = pd.Timedelta(bucket)
    bucket_us = int(bucket_td.total_seconds() * 1e6)
    N_PARTS = 64

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
            % np.uint64(N_PARTS)
        return t.append_column("__pb", pa.array(pb.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def local(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized pass over all (key, bucket) cells in this
        # partition: stable sort then grouped cumsum
        g = g.sort_values([key_col, "__bucket", ts_col],
                          kind="mergesort").copy()
        g["__local_cum"] = g.groupby([key_col, "__bucket"],
                                     sort=False)[value_col].cumsum()
        return g.drop(columns=["__pb"])

    part = tagged.groupby("__pb").map_groups(
        local, batch_format="pandas").materialize()

    # phase 2: per-(key, bucket) sums — per-batch vectorized partials,
    # then one sorted aggregate over the (small) partial rows
    def partial_sums(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([key_col, "__bucket"], sort=False) \
            .agg(__part_sum=(value_col, "sum")).reset_index()

    sums = part.map_batches(partial_sums, batch_format="pandas") \
        .groupby([key_col, "__bucket"]) \
        .aggregate(Sum("__part_sum", alias_name="__bucket_sum"))

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__bucket", kind="mergesort").copy()
        g["__offset"] = g["__bucket_sum"].cumsum() - g["__bucket_sum"]
        # reconstruct the combined id exactly as tag() built it
        g["__kb"] = (g[key_col].astype(str) + "|"
                     + g["__bucket"].astype("int64").astype(str))
        return g[["__kb", "__offset"]]

    # materialized: the join probes .schema() on its inputs, and an
    # unmaterialized offsets side would re-run the whole sums pipeline
    # per probe (the minhash .schema() pitfall)
    offs = sums.groupby(key_col).map_groups(
        prefix, batch_format="pandas").materialize()

    # phase 3: join offsets back and add (one narrow shuffle each side)
    joined = bucketed_equi_join(
        part, offs, key="__kb",
        left_cols=[c for c in part.schema().names if c != "__bucket"],
        right_cols=["__kb", "__offset"])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["running_sum"] = b["__local_cum"] + b["__offset"]
        return b.drop(columns=["__kb", "__local_cum", "__offset"])

    return joined.map_batches(finish, batch_format="pandas")


def session_windows_bucketed(ds, key_col: str, ts_col: str,
                             gap: "pd.Timedelta | str" = "30min",
                             bucket: "pd.Timedelta | str" = "1d"):
    """Scale-safe sessionization: ``session_windows`` holds one KEY's
    entire history in a single group, which breaks when one hot key has
    more events than a worker's memory. This form bounds group size by
    (key × coarse time bucket):

    phase 1 — groupby a hash PARTITION of (key, bucket): inside each
    bounded frame, ONE vectorized pandas pass sessionizes every (key,
    bucket) cell at once (new session at cell change or gap > ``gap``)
    and emits SESSION rows (one per session, not per event) — no
    frame-per-cell overhead;
    phase 2 — groupby (key) over the session rows only: classic
    gap-merge of adjacent sessions across bucket boundaries (sessions
    per key ≪ events per key, so the phase-2 group is tiny even for a
    key whose raw history is unbounded).

    Exactly equivalent to ``session_windows``: within-bucket gaps are
    handled locally, cross-bucket gaps by comparing a session's end with
    the next session's start during the merge. Equality is pinned by
    test against the single-group form.
    """
    from prompture_ray.functions.sketches import hash64
    gap_td = pd.Timedelta(gap)
    bucket_td = pd.Timedelta(bucket)
    bucket_us = int(bucket_td.total_seconds() * 1e6)
    N_PARTS = 64

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
        pb = hash64(np.asarray(kb.to_pylist(), dtype=object)) \
            % np.uint64(N_PARTS)
        return t.append_column("__pb", pa.array(pb.astype(np.int64)))

    def local_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__bucket", ts_col],
                          kind="mergesort")
        cell_change = (g[key_col].ne(g[key_col].shift())
                       | g["__bucket"].ne(g["__bucket"].shift()))
        new_s = cell_change | (g[ts_col].diff() > gap_td)
        sid = new_s.cumsum()
        out = g.groupby(sid).agg(
            **{key_col: (key_col, "first")},
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size")).reset_index(drop=True)
        return out

    partial = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__pb") \
        .map_groups(local_sessions, batch_format="pandas")

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("session_start", kind="mergesort")
        rows = []
        for r in g.itertuples(index=False):
            if rows and (r.session_start - rows[-1]["session_end"]
                         <= gap_td):
                rows[-1]["session_end"] = max(rows[-1]["session_end"],
                                              r.session_end)
                rows[-1]["n_events"] += r.n_events
            else:
                rows.append({"session_start": r.session_start,
                             "session_end": r.session_end,
                             "n_events": int(r.n_events)})
        out = pd.DataFrame(rows)
        out.insert(0, key_col, g[key_col].iloc[0])
        out.insert(1, "session_id", np.arange(len(out), dtype=np.int64))
        return out

    return partial.groupby(key_col).map_groups(stitch,
                                               batch_format="pandas")


def session_counts_bucketed(ds, key_col: str, ts_col: str,
                            gap: "pd.Timedelta | str" = "30min",
                            bucket: "pd.Timedelta | str" = "1d"):
    """(key, n_sessions, n_events) via the hot-key-safe bucketed
    sessionizer — group size is bounded by (key × time bucket), so a
    single bot key with 10^8 events never becomes one pandas group
    (VERDICT-r3 'what's wrong' #5). Same result as ``session_counts``
    (pinned by test)."""
    from ray.data.aggregate import Count, Sum
    sw = session_windows_bucketed(ds, key_col, ts_col, gap, bucket)
    return sw.groupby(key_col).aggregate(
        Count(alias_name="n_sessions"),
        Sum("n_events", alias_name="n_events"))


def hopping_window(ds, ts_col: str, keys: list[str], window: str = "2h",
                   hop: str = "1h", agg_col: str | None = None):
    """Hopping (sliding) event-time window: each event lands in
    ``window/hop`` overlapping windows. Replication happens vectorized
    inside map_batches (numpy tile — no per-row loop, no shuffle before
    the single grouped aggregate). ``window`` must be an integer multiple
    of ``hop``; the output ``window_start`` is a timestamp."""
    from ray.data.aggregate import Count, Sum

    window_s = int(pd.Timedelta(window).total_seconds())
    hop_s = int(pd.Timedelta(hop).total_seconds())
    if window_s % hop_s:
        raise ValueError("window must be an integer multiple of hop")
    k = window_s // hop_s

    def replicate(t: pa.Table) -> pa.Table:
        # null timestamps belong to no window — drop them up front (a
        # null ts would surface as NaN after the int cast and crash the
        # int64 window-start build; matches SQL's null-group elision)
        t = t.filter(pc.is_valid(t[ts_col]))
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        sec = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False) \
            // 10**6                       # timestamp[us] → whole seconds
        n = len(sec)
        base = (sec // hop_s) * hop_s
        # j-th replica: window starting j hops earlier (still covers ts)
        starts = np.concatenate([base - j * hop_s for j in range(k)])
        cols = {}
        for key in keys:
            arr = t[key]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[key] = pa.chunked_array([arr] * k).combine_chunks()
        cols["window_start"] = pa.array(
            starts * 10**6, type=pa.int64()).cast(pa.timestamp("us"))
        if agg_col:
            v = t[agg_col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            cols[agg_col] = pa.chunked_array([v] * k).combine_chunks()
        return pa.table(cols)

    aggs = [Count(alias_name="n")]
    if agg_col:
        aggs.append(Sum(agg_col, alias_name=f"sum_{agg_col}"))
    return ds.map_batches(replicate, batch_format="pyarrow") \
             .groupby(keys + ["window_start"]).aggregate(*aggs)


def group_quantiles(ds, key_col: str, value_col: str,
                    qs: tuple = (0.5, 0.9, 0.99)):
    """EXACT per-group discrete quantiles (value at index ceil(q·n)−1 of
    the sorted group — SQL ``quantile_disc`` semantics; the KLL sketch in
    functions/sketches.py is the approximate/streaming form). Groups are
    shuffled once; inside each group the computation is one numpy sort."""

    from fractions import Fraction
    fracs = [(q, Fraction(str(q))) for q in qs]

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy(dtype=np.float64))
        v = v[~np.isnan(v)]
        row = {key_col: [g[key_col].iloc[0]]}
        for q, fr in fracs:
            # EXACT integer ceil(q*n) — float q*n is off-by-one at an ulp
            # for some (q, n); the SQL oracle uses the same integer form
            idx = max(0, -(-fr.numerator * len(v) // fr.denominator) - 1) \
                if len(v) else 0
            name = f"q{str(q).replace('0.', '')}"
            row[name] = [float(v[idx])] if len(v) else [float("nan")]
        return pd.DataFrame(row)

    return ds.groupby(key_col).map_groups(quant, batch_format="pandas")
