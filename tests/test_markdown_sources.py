"""Markdown strip/frontmatter + file readers (reference MarkdownParser /
CsvParser semantics, ingestion/parsers/)."""

import pyarrow as pa

from prompture_ray.functions.extract_markdown import (
    strip_markdown, extract_frontmatter)


def test_strip_markdown():
    md = ("# Title\nSome **bold** and *italic* and ***both***.\n"
          "A [link](http://x.com) and ![alt text](img.png).\n"
          "```python\ncode_line()\n```\nInline `code` too.\n"
          "<div>html</div> tail")
    out = strip_markdown(md)
    assert "Title" in out and "#" not in out
    assert "bold" in out and "**" not in out
    assert "link" in out and "http://x.com" not in out
    assert "alt text" in out and "img.png" not in out
    assert "code_line()" in out and "```" not in out
    assert "code" in out and "`" not in out
    assert "html" in out and "<div>" not in out
    assert strip_markdown("") == ""


def test_extract_frontmatter():
    content, meta = extract_frontmatter(
        "---\ntitle: My Doc\nauthor: 'someone'\n# comment\n---\nbody here")
    assert content == "body here"
    assert meta == {"title": "My Doc", "author": "someone"}
    content, meta = extract_frontmatter("no frontmatter")
    assert content == "no frontmatter" and meta == {}


def test_markdown_and_csv_readers(ray_session, tmp_path):
    from prompture_ray.sources import read_markdown_files, read_csv_files
    (tmp_path / "a.md").write_text(
        "---\ntitle: A\n---\n# Hello\n**world**")
    df = read_markdown_files([str(tmp_path / "a.md")]).to_pandas()
    assert df["text"].tolist() == ["Hello\nworld"]
    assert '"title": "A"' in df["frontmatter_json"][0]

    (tmp_path / "t.csv").write_text("a,b\n1,x\n2,y\n")
    cdf = read_csv_files([str(tmp_path / "t.csv")]).to_pandas()
    assert cdf["a"].tolist() == [1, 2]
    assert cdf["b"].tolist() == ["x", "y"]
    (tmp_path / "t.tsv").write_text("a\tb\n5\tz\n")
    tdf = read_csv_files([str(tmp_path / "t.tsv")]).to_pandas()
    assert tdf["a"].tolist() == [5] and tdf["b"].tolist() == ["z"]


def test_warc_roundtrip_and_reader(ray_session, tmp_path):
    from prompture_ray.sources.warc import (
        build_warc, parse_warc_records, read_warc_files)
    recs = [
        {"url": "http://a.example/x", "warc_ts": "2024-01-01T00:00:00Z",
         "html": b"<html><body>Hello A</body></html>"},
        {"url": "http://b.example/y", "warc_ts": "2024-01-02T00:00:00Z",
         "html": b"<html><body>Hi B &amp; co</body></html>"},
    ]
    for compress, name in ((False, "f.warc"), (True, "f.warc.gz")):
        blob = build_warc(recs, compress=compress)
        back = parse_warc_records(blob)
        assert [r["url"] for r in back] == [r["url"] for r in recs]
        assert [r["html"] for r in back] == [r["html"] for r in recs]
        (tmp_path / name).write_bytes(blob)
        df = read_warc_files([str(tmp_path / name)]).to_pandas() \
            .sort_values("url", ignore_index=True)
        assert df["url"].tolist() == ["http://a.example/x",
                                      "http://b.example/y"]
        assert df["text"].tolist()[0] == "Hello A"
        assert "Hi B & co" in df["text"].tolist()[1]


def test_warc_parser_robustness():
    from prompture_ray.sources.warc import parse_warc_records, build_warc
    assert parse_warc_records(b"") == []
    assert parse_warc_records(b"garbage no records") == []
    # truncated record: parser stops cleanly
    blob = build_warc([{"url": "u", "warc_ts": "t", "html": b"x" * 50}])
    assert parse_warc_records(blob[:30]) == []
    # non-response records are skipped
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    assert parse_warc_records(info + blob) != []
    assert len(parse_warc_records(info + blob)) == 1
