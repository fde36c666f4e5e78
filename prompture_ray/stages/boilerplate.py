"""Per-host boilerplate line removal (trafilatura / CCNet shape).

A line is boilerplate FOR ITS HOST when it occurs in at least
``max(min_docs, ceil(frac * docs(host)))`` distinct documents of that
host — nav bars, footers, cookie banners repeat on (nearly) every page
of a site but differ across sites, which is exactly what the
corpus-global ``line_dedup`` (stages/dedup.py) cannot express. The
fraction threshold is held exact in integers (``df * frac_den >=
frac_num * n_host``) so the SQL oracle can mirror it with no float
anywhere.

Reference analogue: prompture's HtmlParser drops structural chrome
per page (prompture/ingestion/parsers/html.py; our per-page parity
lives in functions/extract_html.py); this operator is the
corpus-statistical generalization a 100-TB crawl pipeline needs —
chrome the per-page parse can't identify (plain-text nav repeated
site-wide) falls out of cross-page frequency.

Scale shape mirrors ``line_dedup``: pass 1 emits per-batch
(host_hash, line_hash, partial-df) rows — each doc is a single row in
a single batch, so within-batch (doc, line) dedupe makes the global
distinct-doc count exact — and ONE narrow shuffle of 16-byte hash rows
folds the per-host document frequency; host doc counts fold in a
second tiny shuffle. Size-aware dispatch everywhere: host-count and
boilerplate-line tables under ``broadcast_max`` rows are broadcast once
via ``ray.put`` as sorted arrays (searchsorted membership, no further
shuffle); beyond that both go through the hash-bucketed join and docs
are rebuilt inside bounded ``hash(id) % cells`` group frames. Line
identity is hash-only (64-bit mixed host×line; ~n²/2^64 collision odds
per corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _host_line_hashes(t: pa.Table, text_col: str, host_col: str,
                      sep: str):
    """Split every doc into lines; return (flat lines, per-doc line
    counts, per-line doc index, per-line host hash, per-line combined
    host×line hash, per-doc host hash)."""
    from prompture_ray.functions.sketches import hash64
    from prompture_ray.stages.dedup import _split_lines
    flat, lens, doc_idx, h = _split_lines(t, text_col, sep)
    hosts = t[host_col]
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    hh_doc = hash64(np.asarray(hosts.to_pylist(), dtype=object)) \
        .astype(np.int64) if t.num_rows else np.empty(0, dtype=np.int64)
    hh = hh_doc[doc_idx] if len(h) else np.empty(0, dtype=np.int64)
    comb = ((hh.astype(np.uint64) * _GOLD) ^ h.astype(np.uint64)) \
        .view(np.int64) if len(h) else np.empty(0, dtype=np.int64)
    return flat, lens, doc_idx, hh, comb, hh_doc


def boilerplate_lines(ds, text_col: str = "text", id_col: str = "doc_id",
                      host_col: str = "source", min_docs: int = 2,
                      frac_num: int = 1, frac_den: int = 2,
                      sep: str = "\n", n_buckets: int = 32,
                      broadcast_max: int = 20_000_000):
    """Remove per-host boilerplate lines; returns one row per input doc:
    ``(id_col, text_col cleaned, n_kept, n_removed)`` with kept lines
    rejoined by ``sep`` in original order."""
    import ray
    from ray.data.aggregate import Sum
    from prompture_ray.stages.joins import bucketed_equi_join

    # -- pass 1a: per-host distinct-doc frequency of every line --------
    def df_partials(t: pa.Table) -> pa.Table:
        _, _, doc_idx, hh, comb, _ = _host_line_hashes(
            t, text_col, host_col, sep)
        if len(comb) == 0:
            return pa.table({"hh": pa.array([], type=pa.int64()),
                             "comb": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        order = np.lexsort((comb, doc_idx))
        d_, c_ = doc_idx[order], comb[order]
        first = np.ones(len(c_), dtype=bool)
        first[1:] = (d_[1:] != d_[:-1]) | (c_[1:] != c_[:-1])
        u, inv = np.unique(c_[first], return_inverse=True)
        counts = np.bincount(inv, minlength=len(u)).astype(np.int64)
        # host hash of each unique comb (comb determines host)
        hh_of = np.empty(len(u), dtype=np.int64)
        hh_of[inv] = hh[order][first]
        return pa.table({"hh": pa.array(hh_of, type=pa.int64()),
                         "comb": pa.array(u, type=pa.int64()),
                         "df": pa.array(counts, type=pa.int64())})

    df_rows = ds.map_batches(df_partials, batch_format="pyarrow") \
        .groupby(["hh", "comb"]).aggregate(Sum("df", alias_name="df"))

    # -- pass 1b: docs per host ----------------------------------------
    def host_partials(t: pa.Table) -> pa.Table:
        _, _, _, _, _, hh_doc = _host_line_hashes(
            t, text_col, host_col, sep)
        u, counts = np.unique(hh_doc, return_counts=True)
        return pa.table({"hh": pa.array(u.astype(np.int64),
                                        type=pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       type=pa.int64())})

    host_counts = ds.map_batches(host_partials, batch_format="pyarrow") \
        .groupby("hh").aggregate(Sum("n", alias_name="n")).materialize()

    # -- threshold: df*frac_den >= frac_num*n_host AND df >= min_docs --
    if host_counts.count() <= broadcast_max:
        hc = host_counts.to_pandas()
        o = np.argsort(hc["hh"].to_numpy())
        ref = ray.put((hc["hh"].to_numpy()[o], hc["n"].to_numpy()[o]))

        def mark_bp(t: pa.Table) -> pa.Table:
            hs, ns = ray.get(ref)
            hh = t["hh"].to_numpy(zero_copy_only=False)
            df = t["df"].to_numpy(zero_copy_only=False)
            n = ns[np.searchsorted(hs, hh)]  # every hh exists by constr.
            keep = (df >= min_docs) & (df * frac_den >= frac_num * n)
            return t.filter(pa.array(keep)).select(["comb"])

        bp = df_rows.map_batches(mark_bp, batch_format="pyarrow") \
            .materialize()
    else:
        # the join probes .schema() on its inputs — materialize the
        # groupby output or its whole lineage runs once per probe
        joined = bucketed_equi_join(df_rows.materialize(), host_counts,
                                    key="hh", n_buckets=n_buckets)

        def filt(b: pd.DataFrame) -> pd.DataFrame:
            df, n = b["df"].to_numpy(), b["n"].to_numpy()
            keep = (df >= min_docs) & (df * frac_den >= frac_num * n)
            return b.loc[keep, ["comb"]]

        bp = joined.map_batches(filt, batch_format="pandas").materialize()

    # -- pass 2: rebuild each doc from its kept lines -------------------
    if bp.count() <= broadcast_max:
        combs_sorted = np.sort(np.concatenate(
            [t["comb"].to_numpy(zero_copy_only=False)
             for t in bp.iter_batches(batch_format="pyarrow")]
            or [np.empty(0, dtype=np.int64)]))
        bref = ray.put(combs_sorted)

        def rebuild(t: pa.Table) -> pa.Table:
            cs = ray.get(bref)
            flat, lens, doc_idx, _, comb, _ = _host_line_hashes(
                t, text_col, host_col, sep)
            if len(cs) and len(comb):
                idx = np.clip(np.searchsorted(cs, comb), 0, len(cs) - 1)
                keep = cs[idx] != comb
            else:
                keep = np.ones(len(comb), dtype=bool)
            kept_counts = np.bincount(doc_idx[keep],
                                      minlength=len(lens)).astype(np.int64)
            offsets = np.concatenate(
                ([0], np.cumsum(kept_counts))).astype(np.int32)
            lst = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                flat.filter(pa.array(keep)) if len(comb)
                else pa.array([], type=pa.string()))
            return pa.table({
                id_col: t[id_col],
                text_col: pc.binary_join(lst, sep),
                "n_kept": pa.array(kept_counts, type=pa.int64()),
                "n_removed": pa.array(lens - kept_counts,
                                      type=pa.int64())})

        return ds.map_batches(rebuild, batch_format="pyarrow")

    # 100-TB fallback: line rows × boilerplate hashes through the
    # bucketed left join, per-doc rebuild inside bounded hash(id)%cells
    # group frames (one vectorized pandas pass per cell — never a frame
    # per doc).
    def line_rows(t: pa.Table) -> pa.Table:
        flat, lens, doc_idx, _, comb, _ = _host_line_hashes(
            t, text_col, host_col, sep)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(len(comb)) - doc_start[doc_idx]
        return pa.table({
            "id": pa.array(ids[doc_idx], type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
            "line": flat,
            "comb": pa.array(comb, type=pa.int64())})

    rows = ds.map_batches(line_rows, batch_format="pyarrow").materialize()
    marked = bp.map_batches(
        lambda t: t.append_column("__dup", pa.array(
            np.ones(t.num_rows, dtype=np.int64), type=pa.int64())),
        batch_format="pyarrow").materialize()
    flagged = bucketed_equi_join(rows, marked, key="comb", how="left",
                                 n_buckets=n_buckets)
    n_cells = n_buckets * 2

    def add_cell(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__cell"] = ((b["id"].to_numpy().astype(np.uint64)
                        * _GOLD) % np.uint64(n_cells)).astype(np.int64)
        return b

    def rebuild_cell(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["id", "pos"], kind="mergesort")
        kept = g[g["__dup"].isna()]
        agg = kept.groupby("id", sort=True)["line"].agg(sep.join)
        n_kept = kept.groupby("id", sort=True).size()
        tot = g.groupby("id", sort=True).size()
        out = pd.DataFrame({"id": tot.index.to_numpy()})
        out[text_col] = agg.reindex(tot.index).fillna("").to_numpy()
        out["n_kept"] = n_kept.reindex(tot.index).fillna(0) \
            .to_numpy().astype(np.int64)
        out["n_removed"] = (tot - n_kept.reindex(tot.index).fillna(0)) \
            .to_numpy().astype(np.int64)
        return out.rename(columns={"id": id_col})

    return flagged.map_batches(add_cell, batch_format="pandas") \
        .groupby("__cell").map_groups(rebuild_cell, batch_format="pandas")
