"""Distributed K-means + SemDeDup semantic pruning (Abbas et al. 2023,
arXiv:2303.09540): cluster an embedding column, then drop near-identical
points within each cluster — the "SemDeDup" slot of a curation pipeline,
complementing the pairwise semantic dedup in stages/dedup.py (which has
no clustering prior and goes through hyperplane LSH instead). Beyond the
reference (no corpus-level clustering operator there).

Scale shape:
* ``kmeans_fit`` — Lloyd iterations where each pass is ONE linear scan:
  per-batch vectorized assignment (argmin over a broadcast centroid
  matrix) folds into at most k partial rows per batch (cluster, count,
  packed sum vector); the driver folds k×n_batches bounded partials —
  the MergePartials shape, never data-sized. Centroids ship per
  iteration via ``ray.put``.
* ``kmeans_assign`` — pure map_batches, one matmul per batch.
* ``semdedup`` — within-cluster pairwise cosine is inherently quadratic
  in the cluster size (that IS the SemDeDup algorithm); the paper keeps
  clusters bounded by choosing k ≈ n/1000. We groupby(cluster) and run a
  row-blocked matmul inside each group; callers must size k so clusters
  fit a worker (documented partitioning assumption). Kept rule is the
  repo-wide dedup convention: FIRST-WINS by id (a row is dropped iff a
  lower-id row in its cluster has cosine > 1 - eps with it).

Float determinism note: centroid floats are partial-sum-order dependent
(Ray block layout), so correctness contracts should be written against
the DISCRETE assignment/kept outputs with separated planted clusters
(margins >> float noise) — see tests/test_cluster.py and the
semdedup_docs oracle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _vec_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy-ish via the
    flattened values buffer (no per-row Python)."""
    arr = t[vec_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0))
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    return flat.reshape(n, flat.size // n)


def _assign(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Vectorized nearest-centroid: argmin ||v-c||^2 via the matmul
    expansion (|v|^2 is constant per row and dropped)."""
    d2 = (C ** 2).sum(axis=1)[None, :] - 2.0 * (V @ C.T)
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_fit(ds, vec_col: str, k: int, n_iter: int = 5,
               init: np.ndarray | None = None,
               id_col: str | None = None) -> np.ndarray:
    """Lloyd's k-means over a Dataset embedding column → (k, d) centroid
    matrix. ``init``: explicit (k, d) seeds, or None to seed from the k
    smallest-``id_col`` rows (deterministic under any block layout)."""
    import ray

    if init is None:
        if id_col is None:
            raise ValueError("init=None requires id_col for "
                             "deterministic seeding")
        seed_rows = ds.sort(id_col).limit(k) \
            .map_batches(lambda t: t.select([vec_col]),
                         batch_format="pyarrow").take_all()
        C = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)
        if C.shape[0] < k:
            raise ValueError(f"fewer rows than k={k}")
    else:
        C = np.asarray(init, dtype=np.float64).copy()

    d = C.shape[1]
    for _ in range(n_iter):
        ref = ray.put(C)

        def partials(t: pa.Table) -> pa.Table:
            cent = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            V = _vec_matrix(t, vec_col)
            if V.shape[0] == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.binary())})
            lab = _assign(V, cent)
            cnt = np.bincount(lab, minlength=k)
            sums = np.zeros((k, d))
            np.add.at(sums, lab, V)
            nz = np.flatnonzero(cnt)
            return pa.table({
                "cluster": pa.array(nz, type=pa.int64()),
                "cnt": pa.array(cnt[nz].astype(np.int64)),
                "vsum": pa.array([sums[j].tobytes() for j in nz],
                                 type=pa.binary()),
            })

        rows = ds.map_batches(partials,
                              batch_format="pyarrow").take_all()
        tot = np.zeros(k, dtype=np.int64)
        acc = np.zeros((k, d))
        for r in rows:
            j = r["cluster"]
            tot[j] += r["cnt"]
            acc[j] += np.frombuffer(r["vsum"], dtype=np.float64)
        nz = tot > 0
        C[nz] = acc[nz] / tot[nz, None]     # empty clusters keep seeds
    return C


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str,
                  out_col: str = "cluster"):
    """Append the nearest-centroid label (broadcast centroids, one
    matmul per batch)."""
    import ray
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(t: pa.Table) -> pa.Table:
        cent = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        V = _vec_matrix(t, vec_col)
        lab = _assign(V, cent) if V.shape[0] else \
            np.empty(0, dtype=np.int64)
        return t.append_column(out_col, pa.array(lab, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def semdedup(ds, vec_col: str, id_col: str, centroids: np.ndarray,
             eps: float = 1e-6, keep_all: bool = True,
             block: int = 1024):
    """SemDeDup: assign clusters, then within each cluster drop every
    row that has a LOWER-id row at cosine > 1-eps (first-wins).
    ``keep_all=True`` returns all rows with a ``kept`` flag (audit
    mode, oracle-checkable); False filters to survivors.
    One cluster = one group frame — size k to bound clusters."""
    import pandas as pd

    assigned = kmeans_assign(ds, centroids, vec_col)
    thresh = 1.0 - eps

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, ignore_index=True)
        V = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(V, axis=1)
        nrm[nrm == 0] = 1.0
        N = V / nrm[:, None]
        m = N.shape[0]
        kept = np.ones(m, dtype=bool)
        for s in range(0, m, block):
            e = min(s + block, m)
            S = N[s:e] @ N.T                     # (block, m)
            # only earlier (lower-id) rows can kill a row
            mask = np.arange(m)[None, :] < np.arange(s, e)[:, None]
            kept[s:e] = ~np.any((S > thresh) & mask, axis=1)
        out = g[[id_col, "cluster"]].copy()
        out["kept"] = kept
        if not keep_all:
            out = out[kept]
        return out

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pandas")
