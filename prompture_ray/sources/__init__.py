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
