"""Deterministic HTML → text extraction.

Reimplements the reference extraction algorithm
(reference: prompture/ingestion/parsers/html.py:35-87) with the Python
standard library only (bs4 is unavailable in this environment):

1. decode bytes as UTF-8 with ``errors="replace"``     (html.py:47)
2. regex-remove boilerplate tag blocks
   (script/style/nav/footer/header/aside/noscript)     (html.py:16-19,50)
3. strip remaining tags, joining text nodes with "\\n"  (html.py:63-64,
   bs4 ``get_text(separator="\\n")`` semantics)
4. collapse 3+ newlines to 2, then strip               (html.py:71)

The same function is used by the synthetic-data generator to produce the
``text`` column and by the validation engine's ``extract_match`` check, so
"byte-identical extracted text per url" is a real, testable invariant.

``extract_title`` mirrors the reference's title extraction (html.py:75-77).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_BOILERPLATE_TAGS = re.compile(
    r"<(script|style|nav|footer|header|aside|noscript)\b[^>]*>.*?</\1>",
    re.DOTALL | re.IGNORECASE,
)
_COLLAPSE_NL = re.compile(r"\n{3,}")
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)


class _TextCollector(HTMLParser):
    """Collect text nodes; join with a separator like bs4 get_text("\\n")."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []

    def handle_data(self, data: str) -> None:
        self.chunks.append(data)


def strip_tags(html: str) -> str:
    """Strip tags from an HTML string, joining text nodes with newlines
    (stdlib HTMLParser — the semantic reference implementation)."""
    collector = _TextCollector()
    collector.feed(html)
    collector.close()
    return "\n".join(collector.chunks)


# Fast path: regex tag split. Produces output byte-identical to
# ``strip_tags`` whenever every "<" opens a real tag/comment (letters, /,
# !, ?). Raw "<" in text (malformed HTML), or a "<" left unconsumed by the
# tag regex (e.g. an unterminated quote), falls back to the parser so the
# two paths never disagree. ~3.5× faster and far fewer allocations than
# HTMLParser — which matters at 32 concurrent workers where allocation-
# heavy parsing contends on the memory subsystem.
#
# Quote handling mirrors HTMLParser's tolerant tag scan: a quote run counts
# as an attribute value (and may contain ">") only when it directly follows
# "=" — a bare quote elsewhere in the tag is ordinary tag junk and does NOT
# hide a ">". This keeps <div data-x="1>2">text</div> -> "text" while
# <a data=don't>x</a> still ends the tag at the first ">".
# Branches are mutually exclusive at every position ("=" either starts a
# quoted value or provably doesn't), so the scan is deterministic/linear —
# no exponential backtracking on adversarial input.
_TAG_RE = re.compile(
    r"<[/!?a-zA-Z]"
    r"(?:=\s*\"[^\"]*\""      # =-prefixed double-quoted value (">" allowed)
    r"|=\s*'[^']*'"           # =-prefixed single-quoted value
    r"|[^>=]"                 # ordinary tag byte
    r"|=(?!\s*[\"'])"         # "=" not introducing a quoted value
    r")*"
    r">"
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_RAW_LT = re.compile(r"<(?![/!?a-zA-Z]|!--)")


def strip_tags_fast(html: str) -> str:
    html = _COMMENT_RE.sub("", html)
    if _RAW_LT.search(html):
        return strip_tags(html)
    parts = _TAG_RE.split(html)
    if any("<" in p for p in parts):
        # a "<" survived the split (unterminated tag/quote) — let the
        # parser decide rather than guessing.
        return strip_tags(html)
    parts = [p for p in parts if p != ""]
    if any("&" in p for p in parts):
        from html import unescape
        parts = [unescape(p) for p in parts]
    return "\n".join(parts)


def extract_text(html: bytes | str) -> str:
    """Full deterministic extraction pipeline; the byte-identical invariant."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = html
    cleaned = _BOILERPLATE_TAGS.sub("", raw)
    text = strip_tags_fast(cleaned)
    return _COLLAPSE_NL.sub("\n\n", text).strip()


def extract_title(html: bytes | str) -> str | None:
    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = html
    m = _TITLE_RE.search(raw)
    return m.group(1).strip() if m else None


class HtmlExtractor:
    """Actor-pool stage: html:binary column → extracted_text:string column.

    Use as ``ds.map_batches(HtmlExtractor, batch_format="pyarrow",
    batch_size=256, concurrency=N)``. HTML parsing is inherently per-row
    Python (no vectorized kernel exists); the actor pool amortizes setup
    and the small batch size bounds memory for large binary payloads.
    """

    def __init__(self, html_col: str = "html", out_col: str = "extracted_text"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch):  # pa.Table -> pa.Table
        import pyarrow as pa

        from prompture_ray.functions import limit_arrow_threads
        limit_arrow_threads(1)
        col = batch[self.html_col]
        out = [None if v is None else extract_text(v) for v in col.to_pylist()]
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))
