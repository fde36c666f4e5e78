"""Distributed link-graph operators: PageRank power iteration over an
edge Dataset (beyond the reference — the link-analysis slot of a
web-crawl pipeline; Page et al. 1999).

Scale shape: out-degrees are folded into the edge table ONCE (one
grouped shuffle + one bucketed join, materialized); each power
iteration is then exactly one bucketed join (ranks x edges on src — the
rank side is one narrow (node, v) column pair) and one grouped Sum by
dst, with a left join back to the node list for dangling-in nodes. No
driver state grows with the graph; k iterations = k shuffle rounds
(inherent to power iteration).

Float determinism: contributions to one dst are summed by the grouped
aggregate — summation ORDER is layout-dependent, so cross-run
bit-stability holds only for in-degree <= 1 graphs (each Sum has one
operand; the planted ring oracle exploits exactly this) or with
rounding on the consumer side.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges, src_col: str = "src", dst_col: str = "dst",
             k: int = 3, damping: float = 0.85,
             n_buckets: int = 32):
    """k power-iteration rounds from the uniform start over the node
    set (distinct src ∪ dst). Returns a Dataset ``(node, rank)``.
    Dangling-OUT nodes (no out-edges) leak mass like the classic
    simple formulation (no redistribution term) — documented choice so
    the oracle recurrence stays closed-form."""
    from ray.data.aggregate import Sum, Count
    from prompture_ray.stages.joins import bucketed_equi_join

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t[src_col].combine_chunks().cast(pa.int64()),
            "dst": t[dst_col].combine_chunks().cast(pa.int64())})

    e = edges.map_batches(proj, batch_format="pyarrow").materialize()

    # node set = distinct src ∪ dst (one grouped shuffle of 8-byte ids)
    def both(t: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, type=pa.int64())})

    nodes = e.map_batches(both, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="__c")) \
        .map_batches(lambda t: t.select(["node"]),
                     batch_format="pyarrow").materialize()
    n = nodes.count()

    # fold 1/outdeg into the edges once
    outdeg = e.groupby("src").aggregate(Count(alias_name="outdeg"))
    e = bucketed_equi_join(e, outdeg, key="src",
                           n_buckets=n_buckets).materialize()

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "rank": pa.array(np.full(len(t), 1.0 / n))})

    ranks = nodes.map_batches(seed, batch_format="pyarrow") \
        .materialize()
    base = (1.0 - damping) / n

    # Each round's rank table comes out of a bucketed join whose output
    # block count follows its INPUT block count (nodes + sums blocks,
    # where sums itself carries edge blocks) — without a bound the rank
    # table's block count GROWS linearly per round and the join/sort
    # cost per round climbs superlinearly on constant rows (the
    # components-round lesson, dedup.py). Bound it per round.
    target_blocks = int(max(64, np.ceil(n / 500_000)))

    def bound_blocks(ds_):
        if ds_.num_blocks() > 2 * target_blocks:
            ds_ = ds_.repartition(target_blocks).materialize()
        return ds_

    for _ in range(k):
        contrib_in = bucketed_equi_join(
            e, ranks, key="src", right_key="node",
            left_cols=["src", "dst", "outdeg"],
            right_cols=["node", "rank"], n_buckets=n_buckets)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "dst": b["dst"].to_numpy(),
                "c": b["rank"].to_numpy() / b["outdeg"].to_numpy()})

        sums = contrib_in.map_batches(contrib, batch_format="pandas") \
            .groupby("dst").aggregate(Sum("c", alias_name="insum"))
        joined = bucketed_equi_join(nodes, sums, key="node",
                                    right_key="dst", how="left",
                                    n_buckets=n_buckets)

        def update(b: pd.DataFrame) -> pd.DataFrame:
            s = b["insum"].fillna(0.0).to_numpy()
            return pd.DataFrame({
                "node": b["node"].to_numpy().astype(np.int64),
                "rank": base + damping * s})

        ranks = bound_blocks(
            joined.map_batches(update, batch_format="pandas")
            .materialize())
    return ranks


import re

# \x00 excluded from the href class so a match can never span the
# blob's document separator (e.g. an unclosed quote at a doc boundary)
_HREF_RE = re.compile(r'href\s*=\s*["\x27]([^"\x27\x00]+)["\x27]')


def extract_links(ds, html_col: str, id_col: str):
    """(src_id, href) rows from an HTML column. Per batch: ONE regex
    pass over the \\x00-joined document blob (no per-row loop — the
    scan is O(batch bytes) regardless of row count), match offsets
    mapped back to rows via searchsorted on the document start
    offsets."""

    def fn(t: pa.Table) -> pa.Table:
        arr = t[html_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr.cast(pa.string()), "")
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = arr.to_pylist()
        blob = "\x00".join(texts)
        starts = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            lens = np.fromiter((len(x) for x in texts), dtype=np.int64,
                               count=len(texts))
            starts[1:] = np.cumsum(lens[:-1] + 1)
        hrefs, pos = [], []
        for m in _HREF_RE.finditer(blob):     # one pass, per MATCH only
            hrefs.append(m.group(1))
            pos.append(m.start())
        row = np.searchsorted(starts, np.asarray(pos, dtype=np.int64),
                              side="right") - 1 if pos else \
            np.empty(0, dtype=np.int64)
        return pa.table({
            "src": pa.array(ids[row] if len(row) else
                            np.empty(0, dtype=np.int64),
                            type=pa.int64()),
            "href": pa.array(hrefs, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def degree_table(edges, src_col: str = "src", dst_col: str = "dst",
                 shuffle_blocks: int = 128):
    """In/out degree per node over an edge Dataset — the standard
    pre-PageRank audit (degree distribution, dangling/sink detection).
    Returns ``(node, out_deg, in_deg)`` covering distinct src ∪ dst.

    Scale shape: each batch reduces to per-node partial counts with two
    Arrow group_bys (≤ 2 rows per node per batch), then ONE grouped Sum
    shuffle of 24-byte partial rows, coalesced to ``shuffle_blocks``
    first (round-5 pathology: groupby sort cost follows input block
    count — 19x superlinear at 10x rows over a 1500-fragment corpus
    before the coalesce). Edges never shuffle whole; the driver holds
    nothing."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        o = t.select([src_col]).group_by(src_col).aggregate(
            [([], "count_all")])
        i = t.select([dst_col]).group_by(dst_col).aggregate(
            [([], "count_all")])
        node = pa.concat_arrays([
            o[src_col].combine_chunks().cast(pa.int64()),
            i[dst_col].combine_chunks().cast(pa.int64())])
        zeros_o = np.zeros(len(i), dtype=np.int64)
        zeros_i = np.zeros(len(o), dtype=np.int64)
        return pa.table({
            "node": node,
            "__o": pa.array(np.concatenate([
                o["count_all"].to_numpy(zero_copy_only=False)
                .astype(np.int64), zeros_o]), type=pa.int64()),
            "__i": pa.array(np.concatenate([
                zeros_i,
                i["count_all"].to_numpy(zero_copy_only=False)
                .astype(np.int64)]), type=pa.int64())})

    return edges.map_batches(partial, batch_format="pyarrow") \
        .repartition(shuffle_blocks) \
        .groupby("node").aggregate(Sum("__o", alias_name="out_deg"),
                                   Sum("__i", alias_name="in_deg"))


# anchor = href + inner text up to the first '<' (nested markup inside
# an anchor is out of scope — documented; \x00 excluded everywhere so a
# match can never span the blob's document separator)
_ANCHOR_RE = re.compile(
    r'<a\s[^>\x00]*?href\s*=\s*["\x27]([^"\x27\x00]+)["\x27]'
    r'[^>\x00]*>([^<\x00]*)<')


def extract_anchor_texts(ds, html_col: str, id_col: str):
    """(src_id, href, anchor) rows from an HTML column — the anchor-text
    corpus pass (inbound link text is a classic relevance/label signal;
    the reference's HTML surface stops at text extraction). Same scan
    shape as extract_links: ONE regex pass over the \\x00-joined blob
    per batch, per-MATCH work only, offsets mapped back to rows via
    searchsorted. Anchor text is the run up to the first '<' inside the
    element; anchors with nested markup yield their leading text run
    (possibly empty)."""

    def fn(t: pa.Table) -> pa.Table:
        arr = t[html_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr.cast(pa.string()), "")
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = arr.to_pylist()
        blob = "\x00".join(texts)
        starts = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            lens = np.fromiter((len(x) for x in texts), dtype=np.int64,
                               count=len(texts))
            starts[1:] = np.cumsum(lens[:-1] + 1)
        hrefs, anchors, pos = [], [], []
        for m in _ANCHOR_RE.finditer(blob):
            hrefs.append(m.group(1))
            anchors.append(m.group(2).strip())
            pos.append(m.start())
        row = np.searchsorted(starts, np.asarray(pos, dtype=np.int64),
                              side="right") - 1 if pos else \
            np.empty(0, dtype=np.int64)
        return pa.table({
            "src": pa.array(ids[row] if len(row) else
                            np.empty(0, dtype=np.int64),
                            type=pa.int64()),
            "href": pa.array(hrefs, type=pa.string()),
            "anchor": pa.array(anchors, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def canonical_edges(edges, a_col: str = "src", b_col: str = "dst",
                    n_parts: int = 128):
    """Globally-distinct canonical undirected edges ``(u, v)`` with
    ``u < v`` (self-loops dropped, duplicate/reverse edges collapsed):
    per-batch canonicalize + Arrow-distinct shrink, then ONE
    hash(u, v) % n_parts row shuffle where the per-partition
    drop_duplicates is a global distinct (a pair always lands whole).
    Shared by triangle_count / k_core."""
    from prompture_ray.functions.sketches import hash64

    def canon(t: pa.Table) -> pa.Table:
        a = t[a_col].combine_chunks().cast(pa.int64())
        b = t[b_col].combine_chunks().cast(pa.int64())
        keep = pc.invert(pc.equal(a, b))
        a, b = a.filter(keep), b.filter(keep)
        u = pc.min_element_wise(a, b)
        v = pc.max_element_wise(a, b)
        g = pa.table({"u": u, "v": v}).group_by(["u", "v"]).aggregate([])
        un = g["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        vn = g["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pb = ((hash64(un) * np.uint64(0x9E3779B97F4A7C15) + hash64(vn))
              % np.uint64(n_parts)).astype(np.int64)
        return g.append_column("__pb", pa.array(pb))

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])[["u", "v"]]

    # bound the groupby's input block count (round-5 pathology:
    # groupby sort cost follows INPUT blocks — a 1500-fragment corpus
    # pays superlinearly without this coalesce)
    return edges.map_batches(canon, batch_format="pyarrow") \
        .repartition(n_parts) \
        .groupby("__pb").map_groups(distinct, batch_format="pandas")


def triangle_count(edges, a_col: str = "src", b_col: str = "dst", *,
                   broadcast_max: int = 20_000_000,
                   shuffle_blocks: int = 128):
    """Exact triangle count of the UNDIRECTED graph induced by the
    edge Dataset (self-loops dropped, duplicate/reverse edges collapse
    to one) — the clustering-coefficient / community-density staple.
    Returns a one-row Dataset ``(n_triangles,)``.

    Algorithm (the MapReduce node-iterator: Suri & Vassilvitskii,
    WWW'11): orient each canonical edge from lower to higher
    (degree, id) rank — out-degrees then bound by O(sqrt(2m)) — emit a
    wedge per out-neighbor pair of each source (itemsets'
    pairs_within_sorted_groups, pure arithmetic), and count wedges
    whose endpoints are themselves an edge. Each triangle is counted
    exactly once: only its lowest-rank corner emits the closing wedge.

    Scale shape: THREE row shuffles, none carrying payload wider than
    16-24 bytes/row — (1) hash(u,v) partition for exact edge distinct,
    (2) hash(source) partition for wedge expansion, (3) hash(u,v)
    partition of wedges ∪ edges for the closing count (per-partition
    one vectorized pandas groupby; partials fold with one tiny Sum).
    Degree ranks ride a size-aware broadcast (sorted node/degree
    arrays via ray.put) while the node table fits ``broadcast_max``;
    beyond it the orientation falls back to id rank — still EXACT
    (any total order is), only skew-slower; ``broadcast_max=0`` pins
    the fallback for equality tests."""
    import ray
    from ray.data.aggregate import Sum
    from prompture_ray.stages.itemsets import pairs_within_sorted_groups
    from prompture_ray.functions.sketches import hash64

    nparts = shuffle_blocks
    ded = canonical_edges(edges, a_col, b_col,
                          n_parts=nparts).materialize()

    # total degree per node (partial counts -> one narrow grouped Sum)
    def deg_partial(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t["u"].combine_chunks(),
                                 t["v"].combine_chunks()])
        g = pa.table({"node": node}).group_by("node").aggregate(
            [([], "count_all")])
        return pa.table({"node": g["node"],
                         "d": g["count_all"].cast(pa.int64())})

    degs = ded.map_batches(deg_partial, batch_format="pyarrow") \
        .repartition(min(shuffle_blocks, max(1, ded.num_blocks()))) \
        .groupby("node").aggregate(Sum("d", alias_name="d")) \
        .materialize()

    rank_ref = None
    if degs.count() <= broadcast_max:
        dt = degs.to_pandas()
        nodes = dt["node"].to_numpy().astype(np.int64)
        dg = dt["d"].to_numpy().astype(np.int64)
        order = np.argsort(nodes, kind="mergesort")
        rank_ref = ray.put((nodes[order], dg[order]))

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        if rank_ref is not None:
            nodes, dg = ray.get(rank_ref)
            du = dg[np.searchsorted(nodes, u)]
            dv = dg[np.searchsorted(nodes, v)]
            swap = (dv < du) | ((dv == du) & (v < u))
        else:
            swap = np.zeros(len(u), dtype=bool)  # canonical u<v already
        s = np.where(swap, v, u)
        d = np.where(swap, u, v)
        pb = (hash64(s.astype(np.uint64)) % np.uint64(nparts)) \
            .astype(np.int64)
        return pa.table({"s": pa.array(s, type=pa.int64()),
                         "t": pa.array(d, type=pa.int64()),
                         "__pb": pa.array(pb)})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["s", "t"], kind="mergesort")
        s = g["s"].to_numpy()
        t = g["t"].to_numpy()
        first = np.flatnonzero(np.r_[True, s[1:] != s[:-1]]) \
            if len(s) else np.empty(0, dtype=np.int64)
        sizes = np.diff(np.r_[first, len(s)]) if len(s) \
            else np.empty(0, dtype=np.int64)
        li, ri = pairs_within_sorted_groups(sizes)
        x, y = t[li], t[ri]
        return pd.DataFrame({"u": np.minimum(x, y),
                             "v": np.maximum(x, y),
                             "w": np.ones(len(x), dtype=np.int64),
                             "e": np.zeros(len(x), dtype=np.int64)})

    wedge_ds = ded.map_batches(orient, batch_format="pyarrow") \
        .groupby("__pb").map_groups(wedges, batch_format="pandas")

    def edge_tag(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"u": t["u"], "v": t["v"],
                         "w": pa.array(np.zeros(n, dtype=np.int64)),
                         "e": pa.array(np.ones(n, dtype=np.int64))})

    def pb_tag(t: pa.Table) -> pa.Table:
        un = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        vn = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pb = ((hash64(un) * np.uint64(0x9E3779B97F4A7C15) + hash64(vn))
              % np.uint64(nparts)).astype(np.int64)
        return t.append_column("__pb2", pa.array(pb))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["u", "v"], sort=False).agg(
            w=("w", "sum"), e=("e", "max"))
        n = int((agg["w"] * agg["e"]).sum())
        return pd.DataFrame({"n": np.array([n], dtype=np.int64)})

    unioned = wedge_ds.union(ded.map_batches(edge_tag,
                                             batch_format="pyarrow")) \
        .map_batches(pb_tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks)
    partials = unioned.groupby("__pb2").map_groups(
        close, batch_format="pandas")
    total = partials.aggregate(Sum("n", alias_name="n_triangles"))
    val = int(total["n_triangles"]) \
        if total and total.get("n_triangles") is not None else 0
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "n_triangles": pa.array([val], type=pa.int64())}))


def k_core(edges, k: int, a_col: str = "src", b_col: str = "dst", *,
           broadcast_max: int = 20_000_000, max_rounds: int = 100,
           n_buckets: int = 32, shuffle_blocks: int = 128):
    """k-core decomposition — iteratively peel nodes of degree < k
    until the remaining subgraph is stable; returns the surviving
    nodes with their IN-CORE degree as a Dataset ``(node, deg)``
    (empty when the graph has no k-core). The density/community
    filter of web-graph curation (Batagelj-Zaveršnik peeling).

    Scale shape: each round = one degree fold (per-batch partials +
    grouped Sum, the degree_table pattern) and one edge filter by
    alive-node membership — size-aware: alive ids broadcast as ONE
    sorted array via ``ray.put`` + per-batch searchsorted while they
    fit ``broadcast_max``, else two hash-bucketed equi-joins (the
    100-TB path; equality-tested via ``broadcast_max=0``). Rounds ≤
    peeling depth (data-dependent, bounded by ``max_rounds``); the
    driver holds only per-round counts, never node sets (in the
    broadcast regime the sorted id array is object-store-resident)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum
    from prompture_ray.stages.joins import bucketed_equi_join

    if k < 1:
        raise ValueError("k_core: k must be >= 1")

    ded = canonical_edges(edges, a_col, b_col,
                          n_parts=shuffle_blocks).materialize()
    empty = rd.from_arrow(pa.table({
        "node": pa.array([], type=pa.int64()),
        "deg": pa.array([], type=pa.int64())}))

    def deg_partial(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t["u"].combine_chunks(),
                                 t["v"].combine_chunks()])
        g = pa.table({"node": node}).group_by("node").aggregate(
            [([], "count_all")])
        return pa.table({"node": g["node"],
                         "d": g["count_all"].cast(pa.int64())})

    for _ in range(max_rounds):
        if ded.count() == 0:
            return empty
        degs = ded.map_batches(deg_partial, batch_format="pyarrow") \
            .repartition(min(shuffle_blocks,
                             max(1, ded.num_blocks()))) \
            .groupby("node").aggregate(Sum("d", alias_name="deg")) \
            .materialize()
        alive = degs.filter(expr=f"deg >= {int(k)}").materialize()
        n_alive, n_nodes = alive.count(), degs.count()
        if n_alive == n_nodes:
            return degs
        if n_alive == 0:
            return empty

        if n_alive <= broadcast_max:
            ids = np.sort(np.concatenate([
                t["node"].to_numpy(zero_copy_only=False)
                for t in alive.iter_batches(batch_format="pyarrow")]))
            ref = ray.put(ids)

            def keep_edges(t: pa.Table) -> pa.Table:
                a = ray.get(ref)
                u = t["u"].to_numpy(zero_copy_only=False)
                v = t["v"].to_numpy(zero_copy_only=False)
                iu = np.searchsorted(a, u)
                iv = np.searchsorted(a, v)
                ok = ((iu < len(a)) & (a[np.minimum(iu, len(a) - 1)]
                                       == u)) \
                    & ((iv < len(a)) & (a[np.minimum(iv, len(a) - 1)]
                                        == v))
                return t.filter(pa.array(ok))

            ded = ded.map_batches(keep_edges,
                                  batch_format="pyarrow").materialize()
        else:
            alive_u = alive.map_batches(
                lambda t: pa.table({"node": t["node"]}),
                batch_format="pyarrow")
            j1 = bucketed_equi_join(ded, alive_u, key="u",
                                    right_key="node",
                                    n_buckets=n_buckets,
                                    left_cols=["u", "v"],
                                    right_cols=["node"])
            j1 = j1.map_batches(
                lambda b: b[["u", "v"]], batch_format="pandas")
            j2 = bucketed_equi_join(j1, alive_u, key="v",
                                    right_key="node",
                                    n_buckets=n_buckets,
                                    left_cols=["u", "v"],
                                    right_cols=["node"])
            ded = j2.map_batches(
                lambda b: b[["u", "v"]],
                batch_format="pandas").materialize()
    raise RuntimeError(
        f"k_core: no fixpoint within max_rounds={max_rounds} "
        "(raise the cap; peeling depth equals the graph's "
        "degeneracy ordering depth)")


def hits_scores(edges, src_col: str = "src", dst_col: str = "dst",
                k: int = 2, n_buckets: int = 32,
                broadcast_max: int = 20_000_000):
    """k rounds of UNNORMALIZED integer HITS (Kleinberg 1999 —
    "Authoritative Sources in a Hyperlinked Environment", public
    algorithm): starting from hub₀ ≡ 1,

        auth_r(v) = Σ_{u→v} hub_{r−1}(u)
        hub_r(u)  = Σ_{u→v} auth_r(v)

    Returns ``(node, hub, auth)`` after round k over the node set
    (distinct src ∪ dst; multi-edges count multiply — multiset
    semantics). Skipping the usual L2 normalization keeps every score
    an EXACT int64 (the ranking is identical — normalization is a
    positive scalar per round), so a SQL join-aggregate replay is
    bit-identical with no floats anywhere. Caller bound: scores grow
    like (max_in_deg · max_out_deg)^k — with k=2 anything below ~10^4
    degree is safely inside int64.

    Scale shape: size-aware dispatch (the corpus_frequency /
    group_prior precedent). Up to ``broadcast_max`` nodes the score
    vector lives as ONE sorted broadcast array per half-round — each
    half-round is a zero-join pass (per-batch searchsorted attach +
    in-batch partial sums) plus ONE narrow grouped Sum bounded by
    nodes × blocks, with an O(nodes) guarded driver fold. Beyond
    that, each half-round is one ``bucketed_equi_join`` (edges ×
    score table) + one grouped Sum, exactly the pagerank iteration
    shape; score-table block count is re-bounded every round (the
    components-round lesson). Both paths are equality-tested via
    ``broadcast_max=0``."""
    import ray
    from ray.data.aggregate import Sum, Count
    from prompture_ray.stages.joins import bucketed_equi_join

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t[src_col].combine_chunks().cast(pa.int64()),
            "dst": t[dst_col].combine_chunks().cast(pa.int64())})

    e = edges.map_batches(proj, batch_format="pyarrow").materialize()
    m = e.count()
    eblk = int(max(64, np.ceil(m / 500_000)))
    if e.num_blocks() > 2 * eblk:
        # groupby/join cost follows INPUT block count (round-5
        # pathology) — coalesce the edge table once at birth
        e = e.repartition(eblk).materialize()

    def both(t: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, type=pa.int64())})

    nodes = e.map_batches(both, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="__c")) \
        .map_batches(lambda t: t.select(["node"]),
                     batch_format="pyarrow").materialize()
    n = nodes.count()
    target_blocks = int(max(64, np.ceil(n / 500_000)))

    if n <= broadcast_max:
        return _hits_broadcast(e, nodes, n, int(k), target_blocks)

    def bound_blocks(ds_):
        if ds_.num_blocks() > 2 * target_blocks:
            ds_ = ds_.repartition(target_blocks).materialize()
        return ds_

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "hub": pa.array(np.ones(len(t), np.int64))})

    hubs = nodes.map_batches(seed, batch_format="pyarrow") \
        .materialize()
    auths = None

    def _half(score_ds, score_col, join_key, group_key, out_col):
        """auth pass: join on src, sum hub into dst (and vice versa)."""
        j = bucketed_equi_join(
            e, score_ds, key=join_key, right_key="node",
            left_cols=["src", "dst"],
            right_cols=["node", score_col], n_buckets=n_buckets)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": b[group_key].to_numpy().astype(np.int64),
                "v": b[score_col].fillna(0).to_numpy()
                .astype(np.int64)})

        sums = j.map_batches(contrib, batch_format="pandas") \
            .groupby("node").aggregate(Sum("v", alias_name="v"))
        full = bucketed_equi_join(nodes, sums, key="node",
                                  how="left", n_buckets=n_buckets)

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": b["node"].to_numpy().astype(np.int64),
                out_col: b["v"].fillna(0).to_numpy()
                .astype(np.int64)})

        return bound_blocks(
            full.map_batches(finish, batch_format="pandas")
            .materialize())

    for _ in range(int(k)):
        auths = _half(hubs, "hub", "src", "dst", "auth")
        hubs = _half(auths, "auth", "dst", "src", "hub")

    out = bucketed_equi_join(hubs, auths, key="node",
                             n_buckets=n_buckets)

    def sel(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "hub": t["hub"].combine_chunks().cast(pa.int64()),
            "auth": t["auth"].combine_chunks().cast(pa.int64())})

    return out.map_batches(sel, batch_format="pyarrow")


def _hits_broadcast(e, nodes, n: int, k: int, target_blocks: int):
    """Broadcast HITS rounds (≤ broadcast_max nodes — guarded by the
    caller): the per-round score vector ships once via ray.put as a
    (sorted nodes, values) pair; each half-round is a zero-join
    per-batch pass (searchsorted attach + in-batch partial groupby)
    + ONE narrow grouped Sum of (node, v) partials + an O(nodes)
    driver reindex (the same bound the broadcast itself already
    holds)."""
    import ray
    import ray.data as rd

    nt = pa.concat_tables(
        [b for b in nodes.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    node_arr = np.sort(nt["node"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))

    def half(score_vec: np.ndarray, join_col: str, group_col: str):
        ref = ray.put((node_arr, score_vec))

        def contrib(t: pa.Table) -> pd.DataFrame:
            na, sv = ray.get(ref)
            j = t[join_col].to_numpy(zero_copy_only=False)
            g = t[group_col].to_numpy(zero_copy_only=False)
            v = sv[np.searchsorted(na, j)]
            # partial sums INDEXED into the node order — the final fold
            # is then one bincount per batch on the driver; a grouped
            # aggregate over ~|nodes| distinct keys measured ~100×
            # slower than this shape (the round-5 pathology, extended:
            # Ray grouped aggregates degrade with distinct-group count)
            idx = np.searchsorted(na, g)
            s = np.bincount(idx, weights=v, minlength=len(na))
            keep = np.flatnonzero(s)
            return pd.DataFrame({"i": keep,
                                 "v": s[keep].astype(np.int64)})

        out = np.zeros(n, dtype=np.int64)
        for b in e.map_batches(contrib, batch_format="pyarrow") \
                .iter_batches(batch_format="pandas"):
            np.add.at(out, b["i"].to_numpy(),
                      b["v"].to_numpy().astype(np.int64))
        return out

    hub = np.ones(n, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(k):
        auth = half(hub, "src", "dst")
        hub = half(auth, "dst", "src")
    res = pa.table({"node": pa.array(node_arr),
                    "hub": pa.array(hub), "auth": pa.array(auth)})
    return rd.from_arrow(res).repartition(
        min(target_blocks, max(1, n // 10_000 + 1)))


def common_neighbors(edges, a_col: str = "src", b_col: str = "dst", *,
                     min_common: int = 1, shuffle_blocks: int = 128):
    """Common-neighbor counts per node pair over the UNDIRECTED graph
    — the integer-exact core of link-prediction scores (Adamic-Adar /
    Jaccard similarity divide this by degree terms; the COUNT itself
    needs no floats). Returns ``(u, v, common, is_edge)`` for every
    pair with ≥ ``min_common`` shared neighbors (u < v; ``is_edge``
    1 when the pair is already an edge — the training-label column).

    Scale shape: the triangle_count pipeline with the orientation
    step removed (common-neighbor pairs need wedges from EVERY
    center): symmetrize the distinct edge set, ONE hash(center)
    partition + arithmetic neighbor-pair expansion per partition
    (Σ deg² work — cap hub degrees upstream on power-law graphs),
    then ONE hash(u,v) partition folding wedge counts and edge flags
    together in a single vectorized pandas pass."""
    from prompture_ray.stages.itemsets import pairs_within_sorted_groups
    from prompture_ray.functions.sketches import hash64

    nparts = shuffle_blocks
    ded = canonical_edges(edges, a_col, b_col,
                          n_parts=nparts).materialize()

    def sym(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.r_[u, v]
        n = np.r_[v, u]
        pb = (hash64(c.astype(np.uint64)) % np.uint64(nparts)) \
            .astype(np.int64)
        return pa.table({"c": pa.array(c), "n": pa.array(n),
                         "__pb": pa.array(pb)})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "n"], kind="mergesort")
        c = g["c"].to_numpy()
        n = g["n"].to_numpy()
        first = np.flatnonzero(np.r_[True, c[1:] != c[:-1]]) \
            if len(c) else np.empty(0, dtype=np.int64)
        sizes = np.diff(np.r_[first, len(c)]) if len(c) \
            else np.empty(0, dtype=np.int64)
        li, ri = pairs_within_sorted_groups(sizes)
        x, y = n[li], n[ri]
        # canonical edges have no self-loops and distinct neighbors
        # within a center, so x != y always
        return pd.DataFrame({"u": np.minimum(x, y),
                             "v": np.maximum(x, y),
                             "w": np.ones(len(x), dtype=np.int64),
                             "e": np.zeros(len(x), dtype=np.int64)})

    wedge_ds = ded.map_batches(sym, batch_format="pyarrow") \
        .groupby("__pb").map_groups(wedges, batch_format="pandas")

    def edge_tag(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"u": t["u"], "v": t["v"],
                         "w": pa.array(np.zeros(n, dtype=np.int64)),
                         "e": pa.array(np.ones(n, dtype=np.int64))})

    def pb_tag(t: pa.Table) -> pa.Table:
        un = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        vn = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pb = ((hash64(un) * np.uint64(0x9E3779B97F4A7C15)
               + hash64(vn)) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("__pb2", pa.array(pb))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["u", "v"], sort=False).agg(
            common=("w", "sum"), is_edge=("e", "max")).reset_index()
        agg = agg[agg["common"] >= int(min_common)]
        agg["common"] = agg["common"].astype("int64")
        agg["is_edge"] = agg["is_edge"].astype("int64")
        return agg

    unioned = wedge_ds.union(
        ded.map_batches(edge_tag, batch_format="pyarrow")) \
        .map_batches(pb_tag, batch_format="pyarrow") \
        .repartition(shuffle_blocks)
    return unioned.groupby("__pb2").map_groups(
        fold, batch_format="pandas")


def negative_edges(edges, k: int, a_col: str = "src",
                   b_col: str = "dst", *,
                   broadcast_max: int = 20_000_000):
    """Deterministic negative sampling for link-prediction /
    embedding training: for every node u, ``k`` pseudo-random
    candidate partners drawn by the Knuth multiplicative hash
    (``idx = ((u·2654435761 + j·40503) mod 2^32) mod n_nodes`` over
    the SORTED node list), keeping (u, cand, j) when cand ≠ u and
    {u, cand} is NOT an edge — block-layout independent, re-runnable,
    and SQL-replayable (the split_assignment precedent). Collisions
    with real edges/self are DROPPED, not retried, so a node yields
    ≤ k negatives (document the rate, don't hide it).

    Scale shape: the node list and the packed canonical edge-key
    array broadcast once (guarded by ``broadcast_max``; ids < 2^31 —
    beyond the guard, swap the membership test for
    ``joins.bloom_semi_filter(exact=False)`` + a bucketed anti-join
    verify); generation is a zero-shuffle per-batch numpy pass over
    the node Dataset."""
    import ray
    from ray.data.aggregate import Count

    ded = canonical_edges(edges, a_col, b_col).materialize()

    def both(t: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            t["u"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, type=pa.int64())})

    nodes = ded.map_batches(both, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="__c")) \
        .map_batches(lambda t: t.select(["node"]),
                     batch_format="pyarrow").materialize()
    n = nodes.count()
    if n > broadcast_max:
        raise ValueError(
            f"negative_edges: {n} nodes exceed "
            f"broadcast_max={broadcast_max}")
    nt = pa.concat_tables(
        [b for b in nodes.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    node_arr = np.sort(nt["node"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
    ekeys = []
    for b in ded.iter_batches(batch_format="pyarrow"):
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        ekeys.append((u << np.int64(32)) | v)
    ek = np.sort(np.concatenate(ekeys)) if ekeys else \
        np.empty(0, dtype=np.int64)
    if len(node_arr) and (node_arr.max() >= 2**31
                          or node_arr.min() < 0):
        raise ValueError("negative_edges: ids must be in [0, 2^31)")
    ref = ray.put((node_arr, ek))

    K1 = np.uint64(2654435761)
    K2 = np.uint64(40503)
    M32 = np.uint64(4294967296)

    def gen(t: pa.Table) -> pa.Table:
        na, eks = ray.get(ref)
        u = t["node"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uu = np.repeat(u, k)
        jj = np.tile(np.arange(k, dtype=np.int64), len(u))
        with np.errstate(over="ignore"):
            h = (uu.astype(np.uint64) * K1
                 + jj.astype(np.uint64) * K2) % M32
        cand = na[(h % np.uint64(len(na))).astype(np.int64)]
        lo = np.minimum(uu, cand)
        hi = np.maximum(uu, cand)
        key = (lo << np.int64(32)) | hi
        pos = np.searchsorted(eks, key)
        is_edge = np.zeros(len(key), dtype=bool)
        in_rng = pos < len(eks)
        is_edge[in_rng] = eks[pos[in_rng]] == key[in_rng]
        keep = (cand != uu) & ~is_edge
        return pa.table({"src": pa.array(uu[keep]),
                         "dst": pa.array(cand[keep]),
                         "j": pa.array(jj[keep])})

    return nodes.map_batches(gen, batch_format="pyarrow")
