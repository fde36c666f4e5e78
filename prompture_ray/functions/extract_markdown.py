"""Markdown → plain text + frontmatter extraction.

Independent implementation of the reference MarkdownParser's
formatting-strip and frontmatter-fallback semantics
(/root/reference/prompture/ingestion/parsers/markdown.py:13-20,86-118):
strip ATX heading markers, bold/italic stars, links/images (keep the
label / alt text), code fences (keep the code body), inline backticks and
HTML tags; frontmatter = a leading ``--- ... ---`` YAML block parsed as
flat ``key: value`` pairs (stdlib only — no yaml dependency).

All patterns compile once at module import; the batch stage runs them per
document (regex substitution is inherently per-string).
"""

from __future__ import annotations

import re

import pyarrow as pa

_HEADING_RE = re.compile(r"^#{1,6}\s+", re.MULTILINE)
_BOLD_ITALIC_RE = re.compile(r"\*{1,3}([^*]+)\*{1,3}")
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\([^)]+\)")
_LINK_RE = re.compile(r"\[([^\]]+)\]\([^)]+\)")
_CODE_BLOCK_RE = re.compile(r"```[^\n]*\n(.*?)```", re.DOTALL)
_INLINE_CODE_RE = re.compile(r"`([^`]+)`")
_HTML_TAG_RE = re.compile(r"<[^>]+>")
_FRONTMATTER_RE = re.compile(r"^---\s*\n(.*?)\n---\s*\n?(.*)", re.DOTALL)


def strip_markdown(text: str) -> str:
    """Markdown formatting → plain text (labels and code bodies kept)."""
    if not text:
        return ""
    out = _CODE_BLOCK_RE.sub(r"\1", text)
    out = _IMAGE_RE.sub(r"\1", out)     # images before links ([]() nests)
    out = _LINK_RE.sub(r"\1", out)
    out = _BOLD_ITALIC_RE.sub(r"\1", out)
    out = _INLINE_CODE_RE.sub(r"\1", out)
    out = _HEADING_RE.sub("", out)
    out = _HTML_TAG_RE.sub("", out)
    return out.strip()


def extract_frontmatter(text: str) -> tuple[str, dict]:
    """Leading ``---`` YAML block → (content, flat key/value metadata)."""
    if not text:
        return "", {}
    m = _FRONTMATTER_RE.match(text)
    if not m:
        return text, {}
    meta: dict = {}
    for line in m.group(1).splitlines():
        if ":" in line and not line.lstrip().startswith("#"):
            k, _, v = line.partition(":")
            k, v = k.strip(), v.strip().strip("'\"")
            if k:
                meta[k] = v
    return m.group(2), meta


class MarkdownTextStage:
    """map_batches stage: markdown column → plain text (+ optional
    frontmatter JSON column)."""

    def __init__(self, md_col: str = "markdown", out_col: str = "text",
                 frontmatter_col: str | None = None):
        self.md_col = md_col
        self.out_col = out_col
        self.frontmatter_col = frontmatter_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import json
        raws = t[self.md_col].to_pylist()
        texts, metas = [], []
        for raw in raws:
            content, meta = extract_frontmatter(raw or "")
            texts.append(strip_markdown(content))
            metas.append(json.dumps(meta, sort_keys=True))
        t = t.append_column(self.out_col,
                            pa.array(texts, type=pa.string()))
        if self.frontmatter_col:
            t = t.append_column(self.frontmatter_col,
                                pa.array(metas, type=pa.string()))
        return t
