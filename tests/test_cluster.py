"""K-means + SemDeDup (stages/cluster.py): numpy cross-checks, planted
margins for the semdedup_docs oracle, blocked-matmul equivalence."""
import numpy as np
import pyarrow as pa

from prompture_ray.stages.cluster import (
    _assign, _vec_matrix, kmeans_assign, kmeans_fit, semdedup)


def _planted_table(n):
    d = np.arange(n, dtype=np.int64)
    V = np.zeros((n, 4))
    V[np.arange(n), d % 4] = 1.0
    V[np.arange(n), (d % 4 + 1) % 4] += 0.1 * (d % 3)
    return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                     "embedding": pa.array(V.tolist(),
                                           type=pa.list_(pa.float64()))}), V


def test_vec_matrix_and_assign():
    t, V = _planted_table(24)
    M = _vec_matrix(t, "embedding")
    assert np.array_equal(M, V)
    C = np.eye(4)
    # argmin ||v - e_j|| == the planted cluster i%4
    assert _assign(M, C).tolist() == [i % 4 for i in range(24)]


def test_kmeans_matches_numpy_lloyd(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(11)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.concatenate([c + rng.normal(0, 0.3, size=(40, 2))
                        for c in centers])
    ids = np.arange(len(X))
    t = pa.table({"id": pa.array(ids, type=pa.int64()),
                  "embedding": pa.array(X.tolist(),
                                        type=pa.list_(pa.float64()))})
    init = centers + 0.5
    got = kmeans_fit(rd.from_arrow(t), "embedding", 3, n_iter=4,
                     init=init)
    # numpy Lloyd reference
    C = init.copy()
    for _ in range(4):
        lab = np.argmin(((X[:, None, :] - C[None]) ** 2).sum(-1), axis=1)
        for j in range(3):
            if (lab == j).any():
                C[j] = X[lab == j].mean(axis=0)
    # well-separated clusters: same assignment each iter, means match to
    # summation-order noise
    assert np.allclose(got, C, atol=1e-9)
    lab_ds = kmeans_assign(rd.from_arrow(t), got, "embedding") \
        .to_pandas().sort_values("id", ignore_index=True)
    assert np.array_equal(lab_ds["cluster"].to_numpy(),
                          np.argmin(((X[:, None, :] - got[None]) ** 2)
                                    .sum(-1), axis=1))


def test_planted_margins_noncircular():
    """The semdedup_docs oracle's two discrete claims, derived with no
    engine code: (a) inter/intra cluster distance gap, (b) the cosine
    gap between identical and non-identical within-cluster vectors."""
    _, V = _planted_table(48)
    # (a) distance^2 of v_i to its own-axis seed vs any other seed
    intra, inter = 0.0, np.inf
    seeds = V[:4]
    for i in range(48):
        d2 = ((seeds - V[i]) ** 2).sum(axis=1)
        intra = max(intra, d2[i % 4])
        inter = min(inter, np.delete(d2, i % 4).min())
    assert intra <= 0.05 and inter >= 1.0
    # (b) cosine margins
    N = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = N @ N.T
    ids = np.arange(48)
    same_cluster = (ids[:, None] % 4) == (ids[None, :] % 4)
    same_res = (ids[:, None] % 12) == (ids[None, :] % 12)
    off = ~np.eye(48, dtype=bool)
    assert S[same_res & off].min() > 1 - 1e-12       # identical pairs
    nonid = same_cluster & ~same_res & off
    assert S[nonid].max() < 0.99523                  # gap vs 1-1e-6


def test_semdedup_first_wins(ray_session):
    import ray.data as rd
    t, _ = _planted_table(60)
    cents = kmeans_fit(rd.from_arrow(t), "embedding", 4, n_iter=2,
                       id_col="doc_id")
    out = semdedup(rd.from_arrow(t), "embedding", "doc_id", cents,
                   eps=1e-6).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["cluster"].tolist() == [i % 4 for i in range(60)]
    assert out["kept"].tolist() == [i < 12 for i in range(60)]
    # filter mode returns exactly the survivors
    surv = semdedup(rd.from_arrow(t), "embedding", "doc_id", cents,
                    eps=1e-6, keep_all=False).to_pandas()
    assert sorted(surv["doc_id"].tolist()) == list(range(12))


def test_semdedup_block_boundary(ray_session):
    """Blocked matmul (block=2) equals the unblocked result."""
    import ray.data as rd
    t, _ = _planted_table(30)
    cents = np.eye(4)
    a = semdedup(rd.from_arrow(t), "embedding", "doc_id", cents,
                 eps=1e-6, block=2).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = semdedup(rd.from_arrow(t), "embedding", "doc_id", cents,
                 eps=1e-6, block=4096).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
