"""Citation extraction / attribution over a text column.

Data-plane port of the reference citation tracker's PARSE half
(/root/reference/prompture/citations/core.py:121 ``extract_citations``:
``[n]`` / ``[n, m]`` bracket markers, claim = sentence fragment before the
marker, hallucinated ids recorded but not counted as cited;
/root/reference/prompture/citations/types.py:99 ``coverage`` = cited
distinct valid ids / supplied sources). The LLM-call half (prompt
formatting, tracker loop) is out of scope like the other driver surfaces.

Two shapes:

- ``extract_citation_rows`` — flat_map: one row per marker
  (doc → claim, source_ids, span, marker) for downstream joins.
- ``citation_summary`` — per-doc rollup: n_citations, n_cited_sources,
  coverage, grounded, clean_text.

Regexes compile once per actor (``__init__``), matching the stateful-stage
contract; the per-doc loop is inherent to position-aware regex parsing.
"""

from __future__ import annotations

import re

import pyarrow as pa

_BRACKET_RE = re.compile(r"\[(\d+(?:\s*,\s*\d+)*)\]")
_SENTENCE_END_RE = re.compile(r"(?<=[.!?])\s+|\n+")
_WS_RE = re.compile(r"[ \t]+")


def parse_citations(text: str) -> tuple[list[dict], str]:
    """(citation dicts, clean_text) for one document — the exact marker /
    claim / span semantics of reference ``extract_citations``."""
    if not text:
        return [], ""
    citations = []
    for match in _BRACKET_RE.finditer(text):
        ids = [s.strip() for s in match.group(1).split(",") if s.strip()]
        upto = text[: match.start()]
        boundaries = list(_SENTENCE_END_RE.finditer(upto))
        claim_start = boundaries[-1].end() if boundaries else 0
        citations.append({
            "claim": upto[claim_start:].strip(),
            "source_ids": ids,
            "start": claim_start,
            "end": match.end(),
            "marker": match.group(0),
        })
    clean = _BRACKET_RE.sub("", text)
    clean = _WS_RE.sub(" ", clean).strip()
    return citations, clean


class CitationRowsStage:
    """flat_map stage: text column → one output row per citation marker."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        texts = t[self.text_col].to_pylist()
        out_id, out_idx, out_claim, out_src, out_s, out_e, out_m = \
            [], [], [], [], [], [], []
        for i, txt in zip(ids, texts):
            cites, _clean = parse_citations(txt)
            for j, c in enumerate(cites):
                out_id.append(i)
                out_idx.append(j)
                out_claim.append(c["claim"])
                out_src.append(c["source_ids"])
                out_s.append(c["start"])
                out_e.append(c["end"])
                out_m.append(c["marker"])
        return pa.table({
            self.id_col: pa.array(out_id),
            "citation_idx": pa.array(out_idx, type=pa.int32()),
            "claim": pa.array(out_claim, type=pa.string()),
            "source_ids": pa.array(out_src, type=pa.list_(pa.string())),
            "start": pa.array(out_s, type=pa.int32()),
            "end": pa.array(out_e, type=pa.int32()),
            "marker": pa.array(out_m, type=pa.string()),
        })


class CitationSummaryStage:
    """Per-doc rollup: citation count, distinct VALID cited sources
    (ids in 1..n_sources — hallucinated ids recorded in the rows stage
    but never counted, per the reference), coverage, grounded flag and
    the marker-stripped clean text."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 n_sources_col: str | None = None, n_sources: int = 0):
        self.text_col = text_col
        self.id_col = id_col
        self.n_sources_col = n_sources_col
        self.n_sources = n_sources

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        texts = t[self.text_col].to_pylist()
        ns = (t[self.n_sources_col].to_pylist() if self.n_sources_col
              else [self.n_sources] * len(ids))
        n_c, n_cited, cov, grounded, clean_out = [], [], [], [], []
        for txt, n_src in zip(texts, ns):
            cites, clean = parse_citations(txt)
            valid = set()
            for c in cites:
                for sid in c["source_ids"]:
                    if sid.isdigit() and 1 <= int(sid) <= (n_src or 0):
                        valid.add(sid)
            n_c.append(len(cites))
            n_cited.append(len(valid))
            cov.append(round(len(valid) / n_src, 6) if n_src else 0.0)
            grounded.append(bool(cites))
            clean_out.append(clean)
        return pa.table({
            self.id_col: t[self.id_col],
            "n_citations": pa.array(n_c, type=pa.int64()),
            "n_cited_sources": pa.array(n_cited, type=pa.int64()),
            "coverage": pa.array(cov, type=pa.float64()),
            "grounded": pa.array(grounded, type=pa.bool_()),
            "clean_text": pa.array(clean_out, type=pa.string()),
        })


def extract_citation_rows(ds, text_col: str = "text",
                          id_col: str = "doc_id"):
    return ds.map_batches(CitationRowsStage(text_col, id_col),
                          batch_format="pyarrow")


def citation_summary(ds, text_col: str = "text", id_col: str = "doc_id",
                     n_sources_col: str | None = None, n_sources: int = 0):
    return ds.map_batches(
        CitationSummaryStage(text_col, id_col, n_sources_col, n_sources),
        batch_format="pyarrow")
