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


def knn_ivf(ds, vec_col: str, id_col: str, queries: np.ndarray,
            k: int = 5, query_ids=None, n_lists: int = 16, n_probe: int = 2,
            sample_size: int = 4096, exclude_self: bool = True, seed: int = 5):
    """IVF ANN: coarse k-means centroids (fit on a seeded sample, broadcast
    once) partition the corpus into inverted lists; each query scores only
    its ``n_probe`` closest lists. Same output schema as ``knn_brute_force``
    (the exact baseline); recall grows with n_probe.
    """
    import pandas as pd
    import ray

    sample = np.stack(
        ds.random_sample(1.0, seed=seed).limit(sample_size)
          .to_pandas()[vec_col].tolist()).astype(np.float64)
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
