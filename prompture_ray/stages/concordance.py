"""Concordance (KWIC — keyword in context): every occurrence of a
literal needle across a corpus, with fixed-width character context on
each side (beyond the reference, whose retrieval surface returns whole
documents — cf. prompture/rag/retrievers.py; KWIC is the corpus
INSPECTION primitive: auditing how a term is used before building
filters or labelers around it).

Scale shape — zero shuffle, output-bounded work:
- each batch concatenates its texts once with a ``\\x00`` separator
  (the needle may not contain NUL, asserted) and walks occurrences
  with C-speed ``str.find`` — the Python loop is per OCCURRENCE, never
  per row or per character;
- hit offsets map back to documents with one ``np.searchsorted`` over
  the cumulative start offsets; a hit can never span two documents
  because the separator cannot appear inside the needle;
- context slicing is per hit (output-size-bounded, like any result
  materialization). Texts never leave their batch; the result is only
  (id, pos, contexts).

Semantics (the oracle contract): OVERLAPPING matches, 1-based CHARACTER
positions — exactly DuckDB's ``substring(text, i, m) = needle`` scan
over ``i in 1 .. length(text)-m+1`` (both sides count code points:
Python str indexing and DuckDB length()/substring() agree on unicode).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def keyword_contexts(ds, needle: str, text_col: str = "text",
                     id_col: str = "doc_id", window: int = 16):
    """One output row per (document, occurrence of ``needle``):
    ``(id_col, pos, left_ctx, right_ctx)`` where ``pos`` is the 1-based
    character position of the match and the contexts are up to
    ``window`` characters on each side (truncated at the document
    boundary, never padded)."""
    if not needle:
        raise ValueError("needle must be non-empty")
    if "\x00" in needle:
        raise ValueError("needle may not contain NUL")
    m = len(needle)

    schema = pa.schema([(id_col, pa.int64()), ("pos", pa.int64()),
                        ("left_ctx", pa.string()),
                        ("right_ctx", pa.string())])

    def per_batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        if not texts:
            return schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64,
                           count=len(texts))
        starts = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            # +1 per separator
            starts[1:] = np.cumsum(lens[:-1] + 1)
        blob = "\x00".join(texts)
        hits = []
        p = blob.find(needle)
        while p != -1:
            hits.append(p)
            p = blob.find(needle, p + 1)  # overlapping semantics
        if not hits:
            return schema.empty_table()
        hit_arr = np.asarray(hits, dtype=np.int64)
        idx = np.searchsorted(starts, hit_arr, side="right") - 1
        pos0 = hit_arr - starts[idx]
        out_left, out_right = [], []
        for h, i, p0 in zip(hits, idx, pos0):
            text = texts[i]
            out_left.append(text[max(0, p0 - window):p0])
            out_right.append(text[p0 + m:p0 + m + window])
        return pa.table({id_col: pa.array(ids[idx], type=pa.int64()),
                         "pos": pa.array(pos0 + 1, type=pa.int64()),
                         "left_ctx": pa.array(out_left,
                                              type=pa.string()),
                         "right_ctx": pa.array(out_right,
                                               type=pa.string())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def keyword_contexts_multi(ds, needles, text_col: str = "text",
                           id_col: str = "doc_id", window: int = 16):
    """Dictionary concordance: ``keyword_contexts`` for a whole term
    list in one pass — the batch blob is built ONCE and each needle
    pays only its own find walk (needle-count passes over the blob,
    per-OCCURRENCE output work; the badword_flags counting stage's
    inspection companion). Adds a ``term`` column; same overlapping
    1-based character semantics per needle."""
    needles = list(needles)
    if not needles:
        raise ValueError("needles must be non-empty")
    for nd in needles:
        if not nd or "\x00" in nd:
            raise ValueError(f"bad needle {nd!r}")

    schema = pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                        ("pos", pa.int64()),
                        ("left_ctx", pa.string()),
                        ("right_ctx", pa.string())])

    def per_batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        if not texts:
            return schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64,
                           count=len(texts))
        starts = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            starts[1:] = np.cumsum(lens[:-1] + 1)
        blob = "\x00".join(texts)
        out_id, out_term, out_pos = [], [], []
        out_left, out_right = [], []
        for needle in needles:
            m = len(needle)
            p = blob.find(needle)
            while p != -1:
                i = int(np.searchsorted(starts, p, side="right") - 1)
                p0 = p - int(starts[i])
                text = texts[i]
                out_id.append(ids[i])
                out_term.append(needle)
                out_pos.append(p0 + 1)
                out_left.append(text[max(0, p0 - window):p0])
                out_right.append(text[p0 + m:p0 + m + window])
                p = blob.find(needle, p + 1)
        return pa.table({id_col: pa.array(out_id, type=pa.int64()),
                         "term": pa.array(out_term, type=pa.string()),
                         "pos": pa.array(out_pos, type=pa.int64()),
                         "left_ctx": pa.array(out_left,
                                              type=pa.string()),
                         "right_ctx": pa.array(out_right,
                                               type=pa.string())})

    return ds.map_batches(per_batch, batch_format="pyarrow")
