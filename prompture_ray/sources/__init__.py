"""Source helpers: column-pruned parquet readers, raw-file ingestion.

Thin wrappers over ``ray.data`` readers that encode this engine's read
discipline: prune columns at the read, size blocks explicitly (Ray's
default SplitBlocks interacts badly with ``include_paths``), and parse
raw files inside ``map_batches`` rather than on the driver (the
distributed form of the reference's parser dispatch,
prompture/ingestion/__init__.py + detect.py).
"""

from __future__ import annotations

from pathlib import Path


def read_webpages(path, columns=None, include_paths: bool = False,
                  target_block_bytes: int = 128 << 20):
    """Read a web_pages fragment directory with explicit block sizing."""
    import ray.data as rd

    p = Path(path)
    files = sorted(str(f) for f in p.glob("*.parquet")) if p.is_dir() \
        else [str(p)]
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {path}")
    total = sum(Path(f).stat().st_size for f in files)
    n_blocks = max(len(files), total // target_block_bytes)
    return rd.read_parquet(files, columns=columns,
                           include_paths=include_paths,
                           override_num_blocks=n_blocks)


def read_html_files(paths, **kwargs):
    """Raw HTML files → rows of (path, html:binary, text:string): the
    file-ingestion path of the reference (HtmlParser.parse over files,
    prompture/ingestion/parsers/html.py:35-87) expressed as
    read_binary_files + extraction in map_batches."""
    import pyarrow as pa
    import ray.data as rd

    from prompture_ray.functions.extract_html import extract_text, extract_title

    ds = rd.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        blobs = t["bytes"].to_pylist()
        texts = [extract_text(b) for b in blobs]
        titles = [extract_title(b) for b in blobs]
        return pa.table({
            "path": t["path"],
            "html": t["bytes"],
            "text": pa.array(texts, type=pa.string()),
            "title": pa.array(titles, type=pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=64)


def read_jsonl(paths, **kwargs):
    """JSONL reader (reference write_dataset's inverse, formats.py:71-88)."""
    import ray.data as rd
    return rd.read_json(paths, **kwargs)


def read_markdown_files(paths, **kwargs):
    """Raw .md files → rows of (path, markdown, text, frontmatter_json):
    the reference MarkdownParser's ingestion path
    (prompture/ingestion/parsers/markdown.py) as read_binary_files +
    strip/frontmatter in map_batches."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from prompture_ray.functions.extract_markdown import (
        extract_frontmatter, strip_markdown)

    ds = rd.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        blobs = t["bytes"].to_pylist()
        mds = [b.decode("utf-8", errors="replace") for b in blobs]
        texts, metas = [], []
        for md in mds:
            content, meta = extract_frontmatter(md)
            texts.append(strip_markdown(content))
            metas.append(json.dumps(meta, sort_keys=True))
        return pa.table({
            "path": t["path"],
            "markdown": pa.array(mds, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "frontmatter_json": pa.array(metas, type=pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=256)


def read_csv_files(paths, delimiter: str | None = None, **kwargs):
    """CSV/TSV reader (reference CsvParser,
    prompture/ingestion/parsers/csv_parser.py — stdlib csv semantics) via
    Ray's arrow-native read_csv; delimiter auto-detected from the
    extension like the reference when not given."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    if delimiter is None:
        first = paths[0] if isinstance(paths, (list, tuple)) else paths
        delimiter = "\t" if str(first).lower().endswith(".tsv") else ","
    return rd.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
        **kwargs)
