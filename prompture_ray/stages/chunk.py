"""Document chunking as flat_map-shaped stages + chunk-result merging.

Reference semantics:
- ``CharacterChunker``: fixed size with overlap
  (reference prompture/rag/chunkers/)
- ``RecursiveCharacterChunker``: split on ["\\n\\n", "\\n", " ", ""] in
  order, pack pieces up to chunk_size with overlap
  (reference prompture/rag/chunkers/recursive.py:48-151; defaults 1200/120
  per dataset/synth.py:93-100)
- ``TokenChunker``: whitespace-token windows
  (reference prompture/rag/chunkers/token.py:60-75)
- chunk merge: arrays concatenated, scalars first-non-null
  (reference prompture/extraction/core.py:887-908 ``_chunked_extract``)

One row in → N chunk rows out; implemented as a vectorized
``map_batches`` that explodes rows (cheaper than per-row ``flat_map``).
Chunk rows carry ``(doc_id, chunk_index, total_chunks, chunk_text)``
(shape of DocumentChunk, prompture/ingestion/chunking.py:27-42).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def chunk_fixed(text: str, size: int, overlap: int = 0) -> list[str]:
    if not text:
        return []
    step = max(1, size - overlap)
    return [text[i:i + size] for i in range(0, len(text), step)
            if text[i:i + size]]


_SEPS = ["\n\n", "\n", " ", ""]


def chunk_recursive(text: str, size: int = 1200, overlap: int = 120,
                    _seps=None) -> list[str]:
    """Recursive character chunking: split on the coarsest separator that
    yields pieces ≤ size; pack pieces greedily with overlap carry."""
    seps = _SEPS if _seps is None else _seps
    if not text:
        return []
    if len(text) <= size:
        return [text]
    sep = seps[0]
    rest = seps[1:] if len(seps) > 1 else seps
    pieces = text.split(sep) if sep else list(text)
    chunks: list[str] = []
    cur = ""
    joiner = sep
    for p in pieces:
        candidate = cur + joiner + p if cur else p
        if len(candidate) <= size:
            cur = candidate
            continue
        if cur:
            chunks.append(cur)
        if len(p) > size:
            sub = chunk_recursive(p, size, overlap, rest)
            chunks.extend(sub[:-1])
            cur = sub[-1] if sub else ""
        else:
            cur = p
    if cur:
        chunks.append(cur)
    if overlap and len(chunks) > 1:
        out = [chunks[0]]
        for c in chunks[1:]:
            tail = out[-1][-overlap:]
            out.append(tail + joiner + c if tail else c)
        return out
    return chunks


def chunk_tokens(text: str, n_tokens: int = 256, overlap: int = 0) -> list[str]:
    toks = text.split() if text else []
    if not toks:
        return []
    step = max(1, n_tokens - overlap)
    return [" ".join(toks[i:i + n_tokens])
            for i in range(0, len(toks), step) if toks[i:i + n_tokens]]


CHUNKERS = {"fixed": chunk_fixed, "recursive": chunk_recursive,
            "tokens": chunk_tokens}


def chunk_documents(ds, text_col: str, id_col: str, strategy: str = "recursive",
                    **kw):
    """Explode documents into chunk rows (flat_map shape, vectorized)."""
    chunker = CHUNKERS[strategy]

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_id, out_idx, out_total, out_text = [], [], [], []
        for i, txt in zip(ids, texts):
            chunks = chunker(txt or "", **kw)
            for j, c in enumerate(chunks):
                out_id.append(i)
                out_idx.append(j)
                out_total.append(len(chunks))
                out_text.append(c)
        return pa.table({
            id_col: pa.array(out_id),
            "chunk_index": pa.array(out_idx, type=pa.int32()),
            "total_chunks": pa.array(out_total, type=pa.int32()),
            "chunk_text": pa.array(out_text, type=pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def merge_chunk_results(ds, id_col: str, list_cols: list[str] = (),
                        scalar_cols: list[str] = ()):
    """Merge per-chunk results back to one row per document: list columns
    concatenated in chunk order, scalars first-non-null (the distributed
    ``_chunked_extract`` merge, reference core.py:887-908)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("chunk_index", kind="mergesort")
        row = {id_col: [g[id_col].iloc[0]],
               "n_chunks": [np.int64(len(g))]}
        for c in list_cols:
            merged: list = []
            for v in g[c]:
                if isinstance(v, (list, np.ndarray)):
                    merged.extend(list(v))
                elif v is not None:
                    merged.append(v)
            row[c] = [merged]
        for c in scalar_cols:
            nn = g[c].dropna()
            row[c] = [nn.iloc[0] if len(nn) else None]
        return pd.DataFrame(row)

    return ds.groupby(id_col).map_groups(merge, batch_format="pandas")
