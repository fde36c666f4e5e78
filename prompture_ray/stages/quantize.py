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
