"""Embedding scalar quantization (int8 compression of embedding
columns — the storage/bandwidth lever for ANN indexes and semantic
dedup at corpus scale; beyond the reference, which holds float
vectors only).

Symmetric per-vector scheme (the faiss ScalarQuantizer QT_8bit_direct
family): scale = max|x| over the vector, q_i = floor(x_i/scale·127 +
0.5) ∈ [-127, 127], dequant x̂_i = q_i·scale/127 (max abs error
scale/254). 4× smaller than float32 with ~1e-2 relative error — the
standard trade for billion-vector stores.

Exactness contract (the oracle basis): embeddings are float32; both
engine and SQL cast to float64 (exact), take max(abs) (exact), and
compute floor(x/scale*127.0 + 0.5) with the SAME association — every
step is a correctly-rounded double op on identical inputs, so the
int8 codes are BIT-IDENTICAL to the SQL oracle with no rounding
tricks needed. Zero vectors quantize to all-zero codes with scale 0.

Scale shape: pure map_batches (flat-buffer numpy over Arrow list
offsets — no per-row Python); nothing is shuffled or broadcast.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _flat_list(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list column → (float64 flat values, int64 offsets)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]            # slice-offset normalization
    return flat, offs


def _quantize_flat(flat: np.ndarray, offs: np.ndarray):
    """(codes float array aligned to flat, per-row scale)."""
    lens = np.diff(offs)
    if flat.size == 0:
        return np.empty(0, np.float64), np.zeros(len(lens), np.float64)
    if (lens == 0).any():
        raise ValueError("quantize_embeddings: empty embedding row")
    scale = np.maximum.reduceat(np.abs(flat), offs[:-1])
    rep = np.repeat(scale, lens)
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor(flat / rep * 127.0 + 0.5)
    return np.where(rep == 0.0, 0.0, q), scale


def quantize_embeddings(ds, emb_col: str, id_col: str):
    """Per-vector int8 codes: ``(id, n_dims, scale, q list<int8>)``."""
    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64())
        flat, offs = _flat_list(t[emb_col])
        q, scale = _quantize_flat(flat, offs)
        codes = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(q.astype(np.int8), type=pa.int8()))
        return pa.table({"id": ids,
                         "n_dims": pa.array(np.diff(offs),
                                            type=pa.int64()),
                         "scale": pa.array(scale, type=pa.float64()),
                         "q": codes})

    return ds.map_batches(fn, batch_format="pyarrow")


def dequantize_embeddings(ds, q_col: str = "q",
                          scale_col: str = "scale"):
    """Inverse map: codes → float32 vectors (x̂ = q·scale/127)."""
    def fn(t: pa.Table) -> pa.Table:
        arr = t[q_col].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        scale = t[scale_col].to_numpy(zero_copy_only=False)
        rep = np.repeat(scale, np.diff(offs))
        x = (flat * rep / 127.0).astype(np.float32)
        vec = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()),
                                       pa.array(x, type=pa.float32()))
        out = t.drop_columns([q_col])
        return out.append_column("embedding", vec)

    return ds.map_batches(fn, batch_format="pyarrow")


def quantization_stats(ds, emb_col: str, id_col: str):
    """Oracle-facing integer profile of the quantization: per vector
    ``(id, n_dims, scale_micro = floor(scale·1e6), q_sum, q_l1)`` —
    every column integer-exact (scale_micro floors the identical
    double on both sides)."""
    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64())
        flat, offs = _flat_list(t[emb_col])
        q, scale = _quantize_flat(flat, offs)
        if flat.size:
            q_sum = np.add.reduceat(q, offs[:-1]).astype(np.int64)
            q_l1 = np.add.reduceat(np.abs(q), offs[:-1]).astype(np.int64)
        else:
            q_sum = q_l1 = np.zeros(len(scale), np.int64)
        return pa.table({
            "id": ids,
            "n_dims": pa.array(np.diff(offs), type=pa.int64()),
            "scale_micro": pa.array(np.floor(scale * 1e6)
                                    .astype(np.int64)),
            "q_sum": pa.array(q_sum),
            "q_l1": pa.array(q_l1)})

    return ds.map_batches(fn, batch_format="pyarrow")


def quantized_contamination_pairs(train_ds, eval_ds, emb_col: str,
                                  id_col: str, tau_num: int = 9,
                                  tau_den: int = 10):
    """Cross-corpus embedding contamination over int8 codes — find
    (train, eval) pairs whose QUANTIZED cosine ≥ tau_num/tau_den
    (beyond reference; the semantic twin of cross_corpus_minhash_pairs
    for the embedding-based decontamination recipe, cf. SemDeDup).

    Exactness contract: codes are the bit-identical int8 quantization
    (module header), so dot products and squared norms are exact
    int64s, and the threshold test is pure integer cross-
    multiplication — ``dot > 0 AND dot²·tau_den² ≥ tau_num²·‖a‖²·‖b‖²``
    — no floating point anywhere after quantization. Overflow-safe for
    dims ≤ ~10^4 (127²·d ≤ 1.6e8, squared ×100 ≤ 2.6e18·(d/10^4)²).

    Scale shape: the EVAL side is a benchmark suite — small by nature
    (the large-large case is cross_corpus_minhash_pairs) — so its code
    matrix is materialized once and broadcast via ``ray.put``; the
    train corpus streams through one map_batches (an int64 matmul per
    batch), nothing shuffles. Returns (train_id, eval_id, dot, na, nb)
    rows, exact ints.
    """
    import ray

    def codes(t: pa.Table) -> tuple:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs = _flat_list(t[emb_col])
        q, _ = _quantize_flat(flat, offs)
        lens = np.diff(offs)
        if len(np.unique(lens)) > 1:
            raise ValueError("contamination: ragged embedding dims")
        d = int(lens[0]) if len(lens) else 0
        return ids, q.astype(np.int64).reshape(-1, d)

    ev = eval_ds.materialize()
    parts = [codes(t) for t in ev.iter_batches(batch_format="pyarrow")]
    e_ids = np.concatenate([p[0] for p in parts]) if parts \
        else np.empty(0, np.int64)
    e_mat = np.concatenate([p[1] for p in parts]) if parts \
        else np.empty((0, 0), np.int64)
    e_nb = (e_mat * e_mat).sum(axis=1)
    ref = ray.put((e_ids, e_mat, e_nb))
    num2 = int(tau_num) * int(tau_num)
    den2 = int(tau_den) * int(tau_den)

    def score(t: pa.Table) -> pa.Table:
        eids, emat, enb = ray.get(ref)
        ids, qm = codes(t)
        empty = pa.table({
            "train_id": pa.array([], type=pa.int64()),
            "eval_id": pa.array([], type=pa.int64()),
            "dot": pa.array([], type=pa.int64()),
            "na": pa.array([], type=pa.int64()),
            "nb": pa.array([], type=pa.int64())})
        if not len(ids) or not len(eids):
            return empty
        dot = qm @ emat.T
        na = (qm * qm).sum(axis=1)
        hit = (dot > 0) & (dot * dot * den2
                           >= num2 * na[:, None] * enb[None, :])
        ti, ei = np.nonzero(hit)
        if not len(ti):
            return empty
        return pa.table({
            "train_id": pa.array(ids[ti], type=pa.int64()),
            "eval_id": pa.array(eids[ei], type=pa.int64()),
            "dot": pa.array(dot[ti, ei], type=pa.int64()),
            "na": pa.array(na[ti], type=pa.int64()),
            "nb": pa.array(enb[ei], type=pa.int64())})

    return train_ds.map_batches(score, batch_format="pyarrow")
