"""DOCX / XLSX ingestion — pure stdlib (zipfile + xml.etree).

Both formats are ZIP containers of XML parts, so no external library is
needed for the text/tabular core the reference parsers extract
(/root/reference/prompture/ingestion/parsers/docx.py, xlsx.py — those
use python-docx/openpyxl; this is an independent stdlib implementation
of the same surface):

- DOCX: ``word/document.xml`` → paragraphs = ``<w:p>``, runs' text =
  ``<w:t>``, tables flattened row-per-line with tab-joined cells.
- XLSX: ``xl/sharedStrings.xml`` + ``xl/worksheets/sheet*.xml`` →
  rows of cell values (shared strings resolved, inline strings,
  numbers; first row may serve as header).

Parsers are pure ``bytes → value`` functions; the Ray readers wrap them
in ``read_binary_files`` + ``map_batches`` like every other source here.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def parse_docx(blob: bytes) -> str:
    """DOCX bytes → plain text (paragraph per line; table rows become
    tab-joined lines in document order)."""
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        xml = z.read("word/document.xml")
    root = ET.fromstring(xml)
    lines: list[str] = []

    def para_text(p) -> str:
        return "".join(t.text or "" for t in p.iter(f"{_W}t"))

    body = root.find(f"{_W}body")
    if body is None:
        return ""
    for el in body:
        if el.tag == f"{_W}p":
            lines.append(para_text(el))
        elif el.tag == f"{_W}tbl":
            for tr in el.iter(f"{_W}tr"):
                cells = ["\n".join(para_text(p) for p in tc.iter(f"{_W}p"))
                         for tc in tr.findall(f"{_W}tc")]
                lines.append("\t".join(cells))
    return "\n".join(lines).strip()


_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def parse_xlsx(blob: bytes, sheet: int = 0) -> list[list]:
    """XLSX bytes → rows of cell values for one worksheet (0-indexed in
    zip order). Shared/inline strings resolved; numeric cells parsed to
    int/float; gaps filled with None."""
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sroot.iter(f"{_S}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_S}t")))
        sheets = sorted(n for n in z.namelist()
                        if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n))
        if sheet >= len(sheets):
            raise IndexError(f"sheet {sheet} not in {sheets}")
        root = ET.fromstring(z.read(sheets[sheet]))

    rows: list[list] = []
    for row in root.iter(f"{_S}row"):
        out: list = []
        for c in row.findall(f"{_S}c"):
            ref = c.get("r", "")
            m = _CELL_REF_RE.fullmatch(ref)
            idx = _col_index(m.group(1)) if m else len(out)
            while len(out) < idx:
                out.append(None)
            ctype = c.get("t", "n")
            if ctype == "s":
                v_el = c.find(f"{_S}v")
                v = shared[int(v_el.text)] if v_el is not None else None
            elif ctype == "inlineStr":
                v = "".join(t.text or "" for t in c.iter(f"{_S}t"))
            elif ctype == "str":
                v_el = c.find(f"{_S}v")
                v = v_el.text if v_el is not None else None
            else:                                   # numeric / bool
                v_el = c.find(f"{_S}v")
                if v_el is None or v_el.text is None:
                    v = None
                else:
                    txt = v_el.text
                    if ctype == "b":
                        v = txt == "1"
                    else:
                        f = float(txt)
                        v = int(f) if f.is_integer() else f
            out.append(v)
        rows.append(out)
    return rows


# ---------------------------------------------------------------------------
# minimal writers (synth/test inverses — real files also parse)
# ---------------------------------------------------------------------------

_CONTENT_TYPES_DOCX = (
    '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
    'package/2006/content-types"><Default Extension="xml" ContentType='
    '"application/xml"/><Override PartName="/word/document.xml" ContentType'
    '="application/vnd.openxmlformats-officedocument.wordprocessingml.'
    'document.main+xml"/></Types>')


def build_docx(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{_esc(p)}</w:t></w:r></w:p>"
        for p in paragraphs)
    doc = (f'<?xml version="1.0"?><w:document xmlns:w='
           f'"{_W[1:-1]}"><w:body>{body}</w:body></w:document>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES_DOCX)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def build_xlsx(rows: list[list]) -> bytes:
    """Rows of str/int/float/None → a minimal single-sheet XLSX
    (strings inline, numbers as values)."""
    def cell_xml(r: int, cidx: int, v) -> str:
        ref = _col_letter(cidx) + str(r + 1)
        if v is None:
            return ""
        if isinstance(v, str):
            return (f'<c r="{ref}" t="inlineStr"><is><t xml:space='
                    f'"preserve">{_esc(v)}</t></is></c>')
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    body = "".join(
        f'<row r="{i + 1}">'
        + "".join(cell_xml(i, j, v) for j, v in enumerate(row)) + "</row>"
        for i, row in enumerate(rows))
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{_S[1:-1]}">'
             f"<sheetData>{body}</sheetData></worksheet>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


# ---------------------------------------------------------------------------
# Ray readers
# ---------------------------------------------------------------------------

def read_docx_files(paths, **kwargs):
    """DOCX files → rows (path, text)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        texts = [parse_docx(b) for b in t["bytes"].to_pylist()]
        return pa.table({"path": t["path"],
                         "text": pa.array(texts, type=pa.string())})

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=64)


def read_xlsx_files(paths, header: bool = True, sheet: int = 0, **kwargs):
    """XLSX files → rows (path, row_idx, one string column per header
    cell — or col0..colN without a header row). Values are stringified
    for a uniform schema across heterogeneous sheets; downstream
    coercion (stages/coerce.py) restores types, like the reference's
    CSV/XLSX → JSON-records path."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        out_path, out_idx, out_json = [], [], []
        import json
        for path, blob in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            rows = parse_xlsx(blob, sheet=sheet)
            if not rows:
                continue
            if header:
                cols = [str(h) for h in rows[0]]
                data = rows[1:]
            else:
                width = max(len(r) for r in rows)
                cols = [f"col{j}" for j in range(width)]
                data = rows
            for i, r in enumerate(data):
                rec = {c: r[j] if j < len(r) else None
                       for j, c in enumerate(cols)}
                out_path.append(path)
                out_idx.append(i)
                out_json.append(json.dumps(rec, sort_keys=True,
                                           default=str))
        return pa.table({
            "path": pa.array(out_path, type=pa.string()),
            "row_idx": pa.array(out_idx, type=pa.int64()),
            "record_json": pa.array(out_json, type=pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=16)
