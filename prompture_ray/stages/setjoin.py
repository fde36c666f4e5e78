"""Exact all-pairs set-similarity join (Jaccard ≥ τ) with prefix
filtering — the PPJoin family (Xiao et al., "Efficient Similarity
Joins for Near Duplicate Detection", WWW 2008 — public algorithm),
re-expressed as Ray Data stages.

Guarantee: EXACT results (every pair with token-set Jaccard ≥ τ, no
misses, no extras) — unlike the MinHash path (stages/dedup.py), which
is probabilistic. The pruning stack is the classic one:

- **prefix filter**: order every doc's tokens by one global total
  order (df-ascending → rarest first, falling back to plain token
  order when the lexicon exceeds ``broadcast_max``; ANY total order is
  correct, df-ascending just prunes best). If J(A,B) ≥ τ the two
  prefixes of length ``|X| − ⌈τ·|X|⌉ + 1`` MUST share a token, so only
  prefix postings enter candidate generation.
- **length filter**: J(A,B) ≥ τ ⇒ τ·max(|A|,|B|) ≤ min(|A|,|B|) —
  applied vectorized at pair-emission time.
- **exact verify**: |A∩B| recomputed distributively for candidate ids
  only (the MinHash stage-2 precedent), threshold test
  ``inter·den ≥ num·(|A|+|B|−inter)`` in pure int64, and the reported
  ``jaccard = inter/union`` is ONE correctly-rounded double division
  of exact ints — bit-identical to a SQL replay.

Scale shape: tokenization/prefix selection are per-batch vectorized
passes (text never shuffles); df is one narrow lexicon-bounded
shuffle; candidate generation and intersection counting are each ONE
hash64(token) % P row shuffle with a single vectorized
sort + run-boundary + arithmetic pair-expansion pass per partition
(itemsets.pairs_within_sorted_groups — no Python loop, no frame per
token). The verify stage broadcasts only the candidate-id and
candidate-pair arrays (O(candidates), enforced by ``candidate_max``
with an actionable error — at web scale raise τ or use
dedup_shingle's MinHash path for recall-bounded discovery first).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from prompture_ray.functions.sketches import hash64
from prompture_ray.stages.itemsets import pairs_within_sorted_groups

_EMPTY_PAIRS = pd.DataFrame({
    "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
    "na": pd.Series(dtype="int64"), "nb": pd.Series(dtype="int64")})


def _token_runs(g: pd.DataFrame):
    """Sort by (th, tok, id); boundaries check th FIRST (int) and the
    true string only at hash-equal neighbors — collisions can never
    merge two distinct tokens into one run."""
    g = g.sort_values(["th", "tok", "id"], kind="mergesort",
                      ignore_index=True)
    th = g["th"].to_numpy()
    tk = g["tok"].to_numpy()
    diff = np.r_[True, th[1:] != th[:-1]]
    same_h = np.flatnonzero(~diff)
    if len(same_h):
        diff[same_h] = tk[same_h] != tk[same_h - 1]
    starts = np.flatnonzero(diff)
    sizes = np.diff(np.r_[starts, len(g)])
    return g, sizes


def _tok_sets(t: pa.Table, id_col: str, text_col: str):
    """Per-row DISTINCT whitespace tokens → (ids-per-token, flat
    tokens, set size per token, row set sizes). Vectorized: one split,
    one pandas drop_duplicates over (row, token)."""
    arr = t[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    toks = pc.utf8_split_whitespace(arr)
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rid = np.repeat(ids, lens)
    df = pd.DataFrame({"id": rid, "tok": flat}).drop_duplicates()
    return df


def set_similarity_join(ds, id_col: str, text_col: str,
                        threshold: float | Fraction, *,
                        broadcast_max: int = 20_000_000,
                        candidate_max: int = 5_000_000,
                        rows_per_part: int = 500_000):
    """All pairs (a < b) of rows whose whitespace token SETS have
    Jaccard ≥ ``threshold``; returns columns (a, b, inter, size_a,
    size_b, jaccard). ``threshold`` is taken as an exact rational
    (float inputs like 0.5 convert exactly; pass a Fraction for
    non-dyadic rates) so the threshold test is pure int64.

    Caller contract: ``id_col`` values are distinct, non-negative and
    < 2^31 (the packed pair-key filter; ids beyond that → pre-map ids,
    as dedup's namespacing queries do)."""
    frac = Fraction(threshold).limit_denominator(10**9) \
        if not isinstance(threshold, Fraction) else threshold
    num, den = frac.numerator, frac.denominator
    if not (0 < frac <= 1):
        raise ValueError("set_similarity_join: threshold in (0, 1]")
    from ray.data.aggregate import Count
    import ray

    # ---- postings: distinct (id, token) + per-id set size ----------
    # tokens are hashed to int64 ONCE here ("th") — every downstream
    # order/lookup/partition works on ints (object-string searchsorted
    # over a millions-entry lexicon was the measured hot spot: ~20×
    # log(lexicon) Python comparisons per posting); the token STRING
    # still travels and run grouping re-checks true string equality,
    # so hash collisions never merge tokens — exactness is unaffected
    def postings(t: pa.Table) -> pa.Table:
        df = _tok_sets(t, id_col, text_col)
        n = df.groupby("id", sort=False)["tok"].transform("size") \
            .to_numpy().astype(np.int64)
        tok = df["tok"].to_numpy()
        th = hash64(np.asarray(tok, dtype=object)) \
            .astype(np.uint64).view(np.int64)
        return pa.table({
            "id": pa.array(df["id"].to_numpy()),
            "tok": pa.array(tok, type=pa.string()),
            "th": pa.array(th),
            "n": pa.array(n)})

    posts = ds.map_batches(postings, batch_format="pyarrow") \
        .materialize()
    # bound the block count ONCE before the grouped shuffles — groupby
    # sort cost follows INPUT block count (round-5 pathology; the
    # canonical_edges/frequent_pairs at-birth coalesce)
    n_posts_pre = posts.count()
    blk = int(max(64, np.ceil(n_posts_pre / rows_per_part)))
    if posts.num_blocks() > 2 * blk:
        posts = posts.repartition(blk).materialize()

    # ---- global token order: df-ascending when the lexicon fits ----
    # df is counted per token HASH (a collision merges two tokens'
    # counts — pruning heuristic only; the ORDER key stays consistent
    # across docs because it is a function of th alone, so the prefix
    # theorem holds regardless)
    dft = posts.groupby("th").aggregate(Count(alias_name="df")) \
        .materialize()
    lex_rows = dft.count()
    if lex_rows <= broadcast_max:
        lt = pa.concat_tables(
            [b for b in dft.iter_batches(batch_format="pyarrow")],
            promote_options="default")
        ths = lt["th"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dfs = lt["df"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ths, kind="mergesort")
        lex_ref = ray.put((ths[order], dfs[order]))
    else:
        lex_ref = None  # plain hash order — still a total order

    # ---- prefix postings -------------------------------------------
    def prefix(t: pa.Table) -> pa.Table:
        th = t["th"].to_numpy(zero_copy_only=False)
        if lex_ref is not None:
            sths, sdfs = ray.get(lex_ref)
            key = sdfs[np.searchsorted(sths, th)]
        else:
            key = np.zeros(len(th), dtype=np.int64)
        d = t.to_pandas()
        d["k"] = key
        d = d.sort_values(["id", "k", "th", "tok"], kind="mergesort",
                          ignore_index=True)
        # position within id run
        idv = d["id"].to_numpy()
        new = np.r_[True, idv[1:] != idv[:-1]]
        starts = np.flatnonzero(new)
        runlen = np.diff(np.r_[starts, len(d)])
        posi = np.arange(len(d), dtype=np.int64) \
            - np.repeat(starts, runlen)
        nn = d["n"].to_numpy()
        p = nn - (num * nn + den - 1) // den + 1
        out = d[posi < p]
        return pa.table({
            "id": pa.array(out["id"].to_numpy()),
            "tok": pa.array(out["tok"].to_numpy(), type=pa.string()),
            "th": pa.array(out["th"].to_numpy()),
            "n": pa.array(out["n"].to_numpy())})

    pref = posts.map_batches(prefix, batch_format="pyarrow")

    # ---- candidate pairs: one token-hash shuffle --------------------
    n_posts = posts.count()
    n_parts = int(max(64, np.ceil(n_posts / rows_per_part)))

    def tag(t: pa.Table) -> pa.Table:
        th = t["th"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        pb = (th % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb))

    def pair_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _EMPTY_PAIRS
        g, sizes = _token_runs(g)
        li, ri = pairs_within_sorted_groups(sizes)
        if not len(li):
            return _EMPTY_PAIRS
        ids = g["id"].to_numpy()
        ns = g["n"].to_numpy()
        a, b = ids[li], ids[ri]
        na, nb = ns[li], ns[ri]
        # length filter: min·den ≥ max·num (ids sorted within run, but
        # sizes arbitrary)
        mn, mx = np.minimum(na, nb), np.maximum(na, nb)
        ok = mn * den >= mx * num
        return pd.DataFrame({"a": a[ok], "b": b[ok],
                             "na": na[ok], "nb": nb[ok]})

    cand = pref.map_batches(tag, batch_format="pyarrow") \
        .groupby("__pb").map_groups(pair_part, batch_format="pandas")

    # pair dedupe: hash(a,b) partition + ONE vectorized drop_duplicates
    # per partition — a grouped-aggregate dedupe over ~|pairs| DISTINCT
    # two-column groups measured ~100× slower (60.5 vs 0.6 s at 850k
    # pairs); sizes ride along (identical on every duplicate)
    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def pair_tag(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (hash64(a).astype(np.uint64) * _GOLD) \
            ^ hash64(b).astype(np.uint64)
        pb = (h % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb))

    def pair_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns="__pb")

    pairs = cand.map_batches(pair_tag, batch_format="pyarrow") \
        .groupby("__pb").map_groups(pair_dedupe,
                                    batch_format="pandas") \
        .materialize()
    n_pairs = pairs.count()
    if n_pairs > candidate_max:
        raise ValueError(
            f"set_similarity_join: {n_pairs} candidate pairs exceed "
            f"candidate_max={candidate_max}; raise the threshold or "
            "pre-bucket with dedup_shingle (MinHash) first")

    # ---- broadcast candidate ids + packed pair keys ------------------
    pt = pa.concat_tables(
        [b for b in pairs.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    pa_ = pt["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    pb_ = pt["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    na_ = pt["na"].to_numpy(zero_copy_only=False).astype(np.int64)
    nb_ = pt["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(pa_) and (pa_.max() >= 2**31 or pb_.max() >= 2**31
                     or pa_.min() < 0):
        raise ValueError("set_similarity_join: ids must be in "
                         "[0, 2^31) — pre-map ids first")
    pk = (pa_ << np.int64(32)) | pb_
    order = np.argsort(pk, kind="mergesort")
    pk = pk[order]
    size_a, size_b = na_[order], nb_[order]
    cids = np.unique(np.r_[pa_, pb_])
    bc = ray.put((cids, pk))

    # ---- intersection counts for candidate ids only ------------------
    _empty_abc = pd.DataFrame({"a": pd.Series(dtype="int64"),
                               "b": pd.Series(dtype="int64"),
                               "c": pd.Series(dtype="int64")})

    def cand_only(t: pa.Table) -> pa.Table:
        cid, _ = ray.get(bc)
        ids = t["id"].to_numpy(zero_copy_only=False)
        hit = np.zeros(len(ids), dtype=bool)
        if len(cid):
            pos = np.searchsorted(cid, ids)
            in_rng = pos < len(cid)
            hit[in_rng] = cid[pos[in_rng]] == ids[in_rng]
        return t.filter(pa.array(hit))

    def inter_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_abc
        _, pks = ray.get(bc)
        g, sizes = _token_runs(g)
        li, ri = pairs_within_sorted_groups(sizes)
        if not len(li):
            return _empty_abc
        ids = g["id"].to_numpy().astype(np.int64)
        a, b = ids[li], ids[ri]
        key = (a << np.int64(32)) | b
        pos = np.searchsorted(pks, key)
        ok = np.zeros(len(key), dtype=bool)
        in_rng = pos < len(pks)
        ok[in_rng] = pks[pos[in_rng]] == key[in_rng]
        d = pd.DataFrame({"a": a[ok], "b": b[ok]})
        out = d.groupby(["a", "b"], sort=False).size().rename("c") \
            .reset_index()
        out["c"] = out["c"].astype("int64")
        return out

    def inter_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], sort=False)["c"].sum() \
            .rename("inter").reset_index()
        out["inter"] = out["inter"].astype("int64")
        return out

    # per-token-partition partial counts → ONE hash(a,b) partition +
    # one vectorized pandas groupby-sum per partition (same rationale
    # as the pair dedupe above)
    inter = posts.map_batches(cand_only, batch_format="pyarrow") \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__pb").map_groups(inter_part, batch_format="pandas") \
        .map_batches(pair_tag, batch_format="pyarrow") \
        .groupby("__pb").map_groups(inter_fold, batch_format="pandas")

    # ---- exact threshold + jaccard -----------------------------------
    def finish(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["inter"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = (a << np.int64(32)) | b
        pos = np.searchsorted(pk, key)
        sa, sb = size_a[pos], size_b[pos]
        union = sa + sb - c
        keep = c * den >= num * union
        return pa.table({
            "a": pa.array(a[keep]), "b": pa.array(b[keep]),
            "inter": pa.array(c[keep]),
            "size_a": pa.array(sa[keep]),
            "size_b": pa.array(sb[keep]),
            "jaccard": pa.array(c[keep].astype(np.float64)
                                / union[keep])})

    return inter.map_batches(finish, batch_format="pyarrow")


def _cross_within_runs(p_pos: np.ndarray, p_run: np.ndarray,
                       f_pos: np.ndarray, f_run: np.ndarray,
                       n_runs: int):
    """GLOBAL index pairs (li from the P rows × ri from the F rows of
    the SAME run) — the directional complement of
    pairs_within_sorted_groups, pure repeat/cumsum arithmetic. Inputs:
    positions and run ids of the two row families, each sorted by run;
    returns (li, ri) into the respective position arrays' values."""
    cf = np.bincount(f_run, minlength=n_runs).astype(np.int64)
    per_p = cf[p_run]
    li = np.repeat(p_pos, per_p)
    total = int(per_p.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    starts = np.cumsum(np.r_[np.int64(0), per_p[:-1]])
    intra = np.arange(total, dtype=np.int64) - np.repeat(starts, per_p)
    f_start = np.cumsum(np.r_[np.int64(0), cf[:-1]])
    ri_idx = np.repeat(f_start[p_run], per_p) + intra
    return li, f_pos[ri_idx]


def containment_join(ds, id_col: str, text_col: str,
                     threshold: float | Fraction, *,
                     broadcast_max: int = 20_000_000,
                     candidate_max: int = 5_000_000,
                     rows_per_part: int = 500_000):
    """DIRECTIONAL set-containment join: all ordered pairs (a, b),
    a ≠ b, with ``|A∩B| ≥ τ·|A|`` (A's token set τ-contained in B) —
    the asymmetric PPJoin variant behind "is this doc's content
    subsumed by another" subset-dedup. Returns (a, b, inter, size_a,
    size_b, containment) with ``containment = inter / size_a`` ONE
    exact-int division.

    Pruning: A-side prefix filter (if |A∩B| ≥ τ|A|, A's df-ordered
    prefix of length |A| − ⌈τ|A|⌉ + 1 must hit B's FULL set — so
    candidates are prefix(A) × full(B) within a token run) plus the
    directional length filter |B| ≥ τ|A|. Verification reuses the
    symmetric intersection recount on canonical (min, max) pairs, then
    fans back out to the surviving directions. Same caller contract as
    :func:`set_similarity_join` (distinct ids in [0, 2^31));
    ``candidate_max`` guards the broadcast arrays."""
    frac = Fraction(threshold).limit_denominator(10**9) \
        if not isinstance(threshold, Fraction) else threshold
    num, den = frac.numerator, frac.denominator
    if not (0 < frac <= 1):
        raise ValueError("containment_join: threshold in (0, 1]")
    from ray.data.aggregate import Count
    import ray

    def postings(t: pa.Table) -> pa.Table:
        df = _tok_sets(t, id_col, text_col)
        n = df.groupby("id", sort=False)["tok"].transform("size") \
            .to_numpy().astype(np.int64)
        tok = df["tok"].to_numpy()
        th = hash64(np.asarray(tok, dtype=object)) \
            .astype(np.uint64).view(np.int64)
        return pa.table({
            "id": pa.array(df["id"].to_numpy()),
            "tok": pa.array(tok, type=pa.string()),
            "th": pa.array(th),
            "n": pa.array(n)})

    posts = ds.map_batches(postings, batch_format="pyarrow") \
        .materialize()
    n_posts = posts.count()
    blk = int(max(64, np.ceil(n_posts / rows_per_part)))
    if posts.num_blocks() > 2 * blk:
        posts = posts.repartition(blk).materialize()

    dft = posts.groupby("th").aggregate(Count(alias_name="df")) \
        .materialize()
    if dft.count() <= broadcast_max:
        lt = pa.concat_tables(
            [b for b in dft.iter_batches(batch_format="pyarrow")],
            promote_options="default")
        ths = lt["th"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dfs = lt["df"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ths, kind="mergesort")
        lex_ref = ray.put((ths[order], dfs[order]))
    else:
        lex_ref = None

    # role-tagged postings: every posting is F (full side); the
    # A-prefix postings are ADDITIONALLY emitted with role P
    def roles(t: pa.Table) -> pa.Table:
        th = t["th"].to_numpy(zero_copy_only=False)
        if lex_ref is not None:
            sths, sdfs = ray.get(lex_ref)
            key = sdfs[np.searchsorted(sths, th)]
        else:
            key = np.zeros(len(th), dtype=np.int64)
        d = t.to_pandas()
        d["k"] = key
        d = d.sort_values(["id", "k", "th", "tok"], kind="mergesort",
                          ignore_index=True)
        idv = d["id"].to_numpy()
        new = np.r_[True, idv[1:] != idv[:-1]]
        starts = np.flatnonzero(new)
        runlen = np.diff(np.r_[starts, len(d)])
        posi = np.arange(len(d), dtype=np.int64) \
            - np.repeat(starts, runlen)
        nn = d["n"].to_numpy()
        p = nn - (num * nn + den - 1) // den + 1
        pref = d[posi < p].copy()
        pref["role"] = np.int64(1)
        d = d.drop(columns="k")
        pref = pref.drop(columns="k")
        d["role"] = np.int64(0)
        both = pd.concat([d, pref], ignore_index=True)
        return pa.Table.from_pandas(both, preserve_index=False)

    tagged = posts.map_batches(roles, batch_format="pyarrow")
    n_parts = int(max(64, np.ceil(n_posts / rows_per_part)))

    def tag(t: pa.Table) -> pa.Table:
        th = t["th"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        pb = (th % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb))

    _empty_dir = pd.DataFrame({
        "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
        "na": pd.Series(dtype="int64"), "nb": pd.Series(dtype="int64")})

    def pair_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_dir
        g = g.sort_values(["th", "tok", "role", "id"],
                          kind="mergesort", ignore_index=True)
        th = g["th"].to_numpy()
        tk = g["tok"].to_numpy()
        diff = np.r_[True, th[1:] != th[:-1]]
        same = np.flatnonzero(~diff)
        if len(same):
            diff[same] = tk[same] != tk[same - 1]
        run_id = np.cumsum(diff) - 1
        n_runs = int(run_id[-1]) + 1
        role = g["role"].to_numpy()
        pos = np.arange(len(g), dtype=np.int64)
        pmask = role == 1
        li, ri = _cross_within_runs(pos[pmask], run_id[pmask],
                                    pos[~pmask], run_id[~pmask],
                                    n_runs)
        if not len(li):
            return _empty_dir
        ids = g["id"].to_numpy()
        ns = g["n"].to_numpy()
        a, b = ids[li], ids[ri]
        na, nb = ns[li], ns[ri]
        ok = (a != b) & (nb * den >= na * num)
        return pd.DataFrame({"a": a[ok], "b": b[ok],
                             "na": na[ok], "nb": nb[ok]})

    cand = tagged.map_batches(tag, batch_format="pyarrow") \
        .groupby("__pb").map_groups(pair_part, batch_format="pandas")

    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def pair_tag(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (hash64(np.minimum(a, b)).astype(np.uint64) * _GOLD) \
            ^ hash64(np.maximum(a, b)).astype(np.uint64)
        pb = (h % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__pb", pa.array(pb))

    def pair_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns="__pb")

    pairs = cand.map_batches(pair_tag, batch_format="pyarrow") \
        .groupby("__pb").map_groups(pair_dedupe,
                                    batch_format="pandas") \
        .materialize()
    n_pairs = pairs.count()
    if n_pairs > candidate_max:
        raise ValueError(
            f"containment_join: {n_pairs} candidate pairs exceed "
            f"candidate_max={candidate_max}; raise the threshold or "
            "pre-bucket with dedup_shingle (MinHash) first")

    pt = pa.concat_tables(
        [b for b in pairs.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    da = pt["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    db = pt["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    na_ = pt["na"].to_numpy(zero_copy_only=False).astype(np.int64)
    nb_ = pt["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(da) and (da.max() >= 2**31 or db.max() >= 2**31
                    or min(da.min(), db.min()) < 0):
        raise ValueError("containment_join: ids must be in "
                         "[0, 2^31) — pre-map ids first")
    # canonical unordered keys for the shared intersection recount
    lo, hi = np.minimum(da, db), np.maximum(da, db)
    ck = np.unique((lo << np.int64(32)) | hi)
    cids = np.unique(np.r_[da, db])
    bc = ray.put((cids, ck))

    _empty_abc = pd.DataFrame({"a": pd.Series(dtype="int64"),
                               "b": pd.Series(dtype="int64"),
                               "c": pd.Series(dtype="int64")})

    def cand_only(t: pa.Table) -> pa.Table:
        cid, _ = ray.get(bc)
        ids = t["id"].to_numpy(zero_copy_only=False)
        hit = np.zeros(len(ids), dtype=bool)
        if len(cid):
            pos = np.searchsorted(cid, ids)
            in_rng = pos < len(cid)
            hit[in_rng] = cid[pos[in_rng]] == ids[in_rng]
        return t.filter(pa.array(hit))

    def inter_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_abc
        _, cks = ray.get(bc)
        g, sizes = _token_runs(g)
        li, ri = pairs_within_sorted_groups(sizes)
        if not len(li):
            return _empty_abc
        ids = g["id"].to_numpy().astype(np.int64)
        a, b = ids[li], ids[ri]
        key = (a << np.int64(32)) | b
        pos = np.searchsorted(cks, key)
        ok = np.zeros(len(key), dtype=bool)
        in_rng = pos < len(cks)
        ok[in_rng] = cks[pos[in_rng]] == key[in_rng]
        d = pd.DataFrame({"a": a[ok], "b": b[ok]})
        out = d.groupby(["a", "b"], sort=False).size().rename("c") \
            .reset_index()
        out["c"] = out["c"].astype("int64")
        return out

    def inter_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], sort=False)["c"].sum() \
            .rename("inter").reset_index()
        out["inter"] = out["inter"].astype("int64")
        return out

    inter = posts.map_batches(cand_only, batch_format="pyarrow") \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__pb").map_groups(inter_part, batch_format="pandas") \
        .map_batches(pair_tag, batch_format="pyarrow") \
        .groupby("__pb").map_groups(inter_fold, batch_format="pandas") \
        .materialize()

    # canonical intersections back on the driver (≤ |candidate pairs|,
    # already guarded) → fan out to the surviving DIRECTIONAL rows
    it = pa.concat_tables(
        [b for b in inter.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    ia = it["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    ib = it["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    ic = it["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
    ikey = (ia << np.int64(32)) | ib
    iorder = np.argsort(ikey, kind="mergesort")
    ikey, ic = ikey[iorder], ic[iorder]
    dkey = (lo << np.int64(32)) | hi
    pos = np.searchsorted(ikey, dkey)
    cvals = np.zeros(len(dkey), dtype=np.int64)
    in_rng = pos < len(ikey)
    match = np.zeros(len(dkey), dtype=bool)
    match[in_rng] = ikey[pos[in_rng]] == dkey[in_rng]
    if len(ic):
        cvals[match] = ic[pos[match]]
    keep = cvals * den >= num * na_
    res = pa.table({
        "a": pa.array(da[keep]), "b": pa.array(db[keep]),
        "inter": pa.array(cvals[keep]),
        "size_a": pa.array(na_[keep]),
        "size_b": pa.array(nb_[keep]),
        "containment": pa.array(cvals[keep].astype(np.float64)
                                / na_[keep])})
    import ray.data as rd
    out_blocks = int(max(1, min(64, len(da) // 100_000 + 1)))
    return rd.from_arrow(res).repartition(out_blocks)
