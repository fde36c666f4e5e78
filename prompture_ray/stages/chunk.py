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

import re

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


# Python-re equivalent of textstats.GPT2_SPLIT_RE (Python has no \p{L}:
# [^\W\d_] = unicode letters, \d = Nd digits — \p{N}'s No/Nl characters
# fall to the punctuation class here, a documented deviation). Every
# character is matched by exactly one alternative, so joining the tokens
# reproduces the text byte-for-byte.
_GPT2_PY_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+")


def chunk_gpt2_tokens(text: str, n_tokens: int = 256,
                      overlap: int = 0) -> list[str]:
    """Token-budget chunking in GPT-2 pre-tokenizer units (the reference
    TokenChunker's budget semantics, rag/chunkers/token.py:60-75, with
    the public split-pattern approximation instead of tiktoken). Chunks
    concatenate to the original text when overlap=0."""
    if not text:
        return []
    toks = _GPT2_PY_RE.findall(text)
    if not toks:
        return []
    step = max(1, n_tokens - overlap)
    return ["".join(toks[i:i + n_tokens]).strip()
            for i in range(0, len(toks), step) if toks[i:i + n_tokens]]


def chunk_bpe_tokens(text: str, n_tokens: int = 256, overlap: int = 0,
                     merges=()) -> list[str]:
    """Token-budget chunking in LEARNED subword units: each whitespace
    word costs ``len(bpe_segment(word, merges))`` budget units (train
    merges with ``stages.bpe.train_bpe`` on the corpus). Greedy fill —
    a chunk closes when the next word would exceed ``n_tokens`` (words
    never split; an over-budget single word gets its own chunk).
    Chunks rejoin with single spaces (whitespace-tokenization
    semantics, like ``chunk_tokens``)."""
    from prompture_ray.stages.bpe import bpe_segment
    toks = text.split() if text else []
    if not toks:
        return []
    ranks = merges if isinstance(merges, dict) \
        else {tuple(m): i for i, m in enumerate(merges)}
    cache: dict = {}
    costs = [len(bpe_segment(w, ranks, cache)) for w in toks]
    chunks, cur, cur_cost = [], [], 0
    for w, c in zip(toks, costs):
        if cur and cur_cost + c > n_tokens:
            chunks.append(" ".join(cur))
            keep = []
            if overlap > 0:   # overlap by BUDGET: walk back until full
                acc, back = 0, []
                for ww in reversed(cur):
                    cw = len(bpe_segment(ww, ranks, cache))
                    if acc + cw > overlap:
                        break
                    back.append(ww)
                    acc += cw
                keep = list(reversed(back))
            cur = keep[:]
            cur_cost = sum(len(bpe_segment(w2, ranks, cache))
                           for w2 in cur)
        cur.append(w)
        cur_cost += c
    if cur:
        chunks.append(" ".join(cur))
    return chunks


# "#" ... "######" with optional title — a bare "#" line is an (empty)
# ATX heading per CommonMark and must delimit, not leak into content
_MD_HEADER_RE = re.compile(r"^(#{1,6})(?:\s+(.*))?\s*$")


def chunk_markdown(text: str, max_level: int = 6,
                   return_each_line: bool = False) -> list[str]:
    """Markdown-aware chunking (reference rag/chunkers/markdown.py:26-70):
    split on ATX header boundaries up to ``max_level``; lines under one
    header path merge into one chunk (or one chunk per line when
    ``return_each_line``). Header lines delimit; content chunks are
    emitted without them, like the reference's ``split_text``."""
    if not text:
        return []
    chunks: list[str] = []
    current: list[str] = []

    def flush():
        body = "\n".join(current).strip()
        if body:
            chunks.append(body)
        current.clear()

    for line in text.splitlines():
        m = _MD_HEADER_RE.match(line)
        if m and len(m.group(1)) <= max_level:
            flush()
        elif return_each_line:
            if line.strip():
                chunks.append(line.strip())
        else:
            current.append(line)
    flush()
    return chunks


def chunk_semantic(text: str, buffer_size: int = 1,
                   threshold_type: str = "percentile",
                   threshold_amount: float = 95.0,
                   min_chunk_size: int = 0, dim: int = 256) -> list[str]:
    """Embedding-breakpoint chunking (reference rag/chunkers/semantic.py:
    86-165): sentence split → windowed combine (±buffer_size) → embed
    (char-trigram hashed embeddings — the in-repo embedder, no model
    needed) → cosine distance between neighbors → breakpoints where the
    distance exceeds the percentile / stddev / IQR threshold → join
    sentences between breakpoints."""
    from prompture_ray.functions.ngram_embed import ngram_embed

    if not text or not text.strip():
        return []
    sentences = [s for s in _SENTENCE_SPLIT_RE.split(text.strip()) if s]
    if len(sentences) <= 1:
        return sentences
    b = buffer_size
    combined = [" ".join(sentences[max(0, i - b):i + b + 1])
                for i in range(len(sentences))]
    emb = ngram_embed(combined, dim=dim)  # rows already L2-normalized
    sims = (emb[:-1] * emb[1:]).sum(axis=1)
    distances = 1.0 - sims
    if distances.size == 0:
        return [" ".join(sentences)]
    if threshold_type == "percentile":
        thr = float(np.percentile(distances, threshold_amount))
    elif threshold_type == "standard_deviation":
        thr = float(distances.mean() + threshold_amount * distances.std())
    elif threshold_type == "interquartile":
        q1, q3 = np.percentile(distances, [25.0, 75.0])
        thr = float(q3 + threshold_amount * (q3 - q1))
    else:
        raise ValueError(f"unknown threshold_type {threshold_type!r}")
    breakpoints = [i for i, d in enumerate(distances) if d > thr]
    chunks: list[str] = []
    start = 0
    for bp in breakpoints:
        c = " ".join(sentences[start:bp + 1]).strip()
        if c:
            chunks.append(c)
        start = bp + 1
    tail = " ".join(sentences[start:]).strip()
    if tail:
        chunks.append(tail)
    if min_chunk_size > 0:
        chunks = [c for c in chunks if len(c) >= min_chunk_size] or chunks[:1]
    return chunks


_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")

CHUNKERS = {"fixed": chunk_fixed, "recursive": chunk_recursive,
            "tokens": chunk_tokens, "gpt2_tokens": chunk_gpt2_tokens,
            "bpe_tokens": chunk_bpe_tokens,
            "markdown": chunk_markdown, "semantic": chunk_semantic}


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
