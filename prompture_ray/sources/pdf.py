"""Minimal PDF text extraction — stdlib + zlib.

Independent implementation of the subset the reference's PdfParser
surfaces as plain text (/root/reference/prompture/ingestion/parsers/
pdf.py — it uses pypdf; unavailable here): scan the file for content
streams, FlateDecode them with ``zlib``, and pull the text-showing
operators out of the page description language:

- ``(string) Tj`` and ``(string) '`` — show text
- ``[(a) -120 (b)] TJ``             — show with kerning (joined)
- ``T* / Td / TD``                   — line moves → newline
- escapes ``\\( \\) \\\\ \\n \\r \\t`` and 3-digit octal

Honest limitations (documented, raise-free): CID/Type0 composite fonts,
non-latin1 encodings, encrypted files and image-only pages yield empty
or approximate text — the same cases where naive pypdf extraction also
degrades. Byte strings are decoded latin-1 (the PDFDocEncoding subset).
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_TEXT_OP_RE = re.compile(
    rb"\((?P<s>(?:\\.|[^\\()])*)\)\s*(?:Tj|')"
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"
    rb"|(?P<nl>T\*|-?[\d.]+\s+-?[\d.]+\s+TD?d?)")
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")
_ESC_RE = re.compile(rb"\\([0-7]{1,3}|.)")


def _unescape(raw: bytes) -> str:
    def sub(m: "re.Match") -> bytes:
        g = m.group(1)
        if g[:1].isdigit():
            return bytes([int(g, 8) & 0xFF])
        return {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                b"f": b"\f"}.get(g, g)
    return _ESC_RE.sub(sub, raw).decode("latin-1", errors="replace")


def extract_pdf_text(blob: bytes) -> str:
    """Best-effort plain text of every decodable content stream."""
    parts: list[str] = []
    for m in _STREAM_RE.finditer(blob):
        start = m.end()
        end = blob.find(b"endstream", start)
        if end == -1:
            continue
        raw = blob[start:end]
        # the spec puts ONE EOL before `endstream`; rstrip-ing all \r\n
        # would corrupt compressed payloads that legitimately END with
        # 0x0a/0x0d bytes, so strip exactly one (and retry on failure)
        if raw.endswith(b"\r\n"):
            data = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            data = raw[:-1]
        else:
            data = raw
        if b"FlateDecode" in m.group(1):
            for candidate in (data, raw, raw.rstrip(b"\r\n")):
                try:
                    data = zlib.decompress(candidate)
                    break
                except zlib.error:
                    continue
            else:
                continue
        if b"Tj" not in data and b"TJ" not in data and b"'" not in data:
            continue
        line: list[str] = []
        for op in _TEXT_OP_RE.finditer(data):
            if op.group("s") is not None:
                line.append(_unescape(op.group("s")))
            elif op.group("arr") is not None:
                line.append("".join(_unescape(s[1:-1]) for s in
                                    _ARR_STR_RE.findall(op.group("arr"))))
            elif op.group("nl") is not None and line:
                parts.append("".join(line))
                line = []
        if line:
            parts.append("".join(line))
    return "\n".join(p for p in parts if p.strip()).strip()


def build_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Minimal well-formed single-page PDF showing ``lines`` — the test
    inverse; also a valid file for external viewers."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(") \
                .replace(")", r"\)")

    content = "BT /F1 12 Tf 72 720 Td " + " ".join(
        f"({esc(ln)}) Tj 0 -14 Td" for ln in lines) + " ET"
    data = content.encode("latin-1")
    filt = b""
    if compress:
        data = zlib.compress(data)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def read_pdf_files(paths, **kwargs):
    """PDF files → rows (path, text)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        texts = [extract_pdf_text(b) for b in t["bytes"].to_pylist()]
        return pa.table({"path": t["path"],
                         "text": pa.array(texts, type=pa.string())})

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=32)
