"""DOCX / XLSX / PDF parsers — stdlib implementations round-tripped
against their minimal writers."""

import pyarrow as pa

from prompture_ray.sources.office import (
    parse_docx, build_docx, parse_xlsx, build_xlsx)
from prompture_ray.sources.pdf import extract_pdf_text, build_pdf


def test_docx_roundtrip():
    paras = ["Title here", "Second paragraph with <angle> & amp",
             "", "tail"]
    text = parse_docx(build_docx(paras))
    assert text == "Title here\nSecond paragraph with <angle> & amp\n\ntail"


def test_xlsx_roundtrip():
    rows = [["name", "n", "score"],
            ["alice", 3, 1.5],
            ["bob", None, 2.0],
            ["comma, quote\"", 7, -1]]
    got = parse_xlsx(build_xlsx(rows))
    assert got[0] == ["name", "n", "score"]
    assert got[1] == ["alice", 3, 1.5]
    assert got[2] == ["bob", None, 2]      # 2.0 parses back as int 2
    assert got[3][0] == 'comma, quote"'


def test_pdf_roundtrip_both_filters():
    lines = ["Hello PDF world", "Line two (with parens)",
             "Back\\slash and tab"]
    for compress in (True, False):
        blob = build_pdf(lines, compress=compress)
        assert blob.startswith(b"%PDF-")
        text = extract_pdf_text(blob)
        assert "Hello PDF world" in text
        assert "Line two (with parens)" in text
        assert "Back\\slash" in text
    assert extract_pdf_text(b"not a pdf") == ""
    assert extract_pdf_text(b"") == ""


def test_office_pdf_readers(ray_session, tmp_path):
    from prompture_ray.sources.office import (
        read_docx_files, read_xlsx_files)
    from prompture_ray.sources.pdf import read_pdf_files
    (tmp_path / "a.docx").write_bytes(build_docx(["doc text", "p2"]))
    (tmp_path / "b.xlsx").write_bytes(build_xlsx(
        [["k", "v"], ["x", 1], ["y", 2]]))
    (tmp_path / "c.pdf").write_bytes(build_pdf(["pdf body text"]))

    d = read_docx_files([str(tmp_path / "a.docx")]).to_pandas()
    assert d["text"].tolist() == ["doc text\np2"]

    x = read_xlsx_files([str(tmp_path / "b.xlsx")]).to_pandas()
    assert len(x) == 2
    import json
    assert json.loads(x["record_json"][0]) == {"k": "x", "v": 1}

    p = read_pdf_files([str(tmp_path / "c.pdf")]).to_pandas()
    assert p["text"].tolist() == ["pdf body text"]
