"""Sitemap XML ingestion (sitemaps.org protocol) — the crawl-seed
companion to robots.txt compliance (stages/robots.py): a crawler's URL
frontier is seeded from ``<urlset>`` sitemaps and ``<sitemapindex>``
files, plain or gzipped (``sitemap.xml.gz`` is standard).

Pure-stdlib parser (xml.etree.ElementTree, namespace-tolerant: tags
are matched by local name so the canonical
``http://www.sitemaps.org/schemas/sitemap/0.9`` namespace, no
namespace, or a vendor variant all parse). ``build_sitemap`` /
``build_sitemap_index`` are the exact inverses used by the planted
round-trip oracle (the WARC/tar/TFRecord precedent).

Reference anchor: the reference ingests single documents by path/URL
(prompture/ingestion/); sitemaps are how that URL list is discovered
at crawl scale.

Scale shape: one Ray read task per sitemap file (independent XML
units, ≤ 50k URLs each per the protocol), parsing inside map_batches;
the driver touches file paths only. A sitemapindex fans out to child
sitemap paths — feed those back through ``read_binary_files`` rather
than recursing driver-side.
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET

import pyarrow as pa

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def build_sitemap(entries: list[dict], *, compress: bool = False,
                  namespace: str = _NS) -> bytes:
    """``<urlset>`` sitemap bytes from [{loc, lastmod?, changefreq?,
    priority?}] — the parse inverse. ``priority`` is emitted verbatim
    (pass a string like "0.8" for byte-stable round trips)."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<urlset xmlns="{namespace}">']
    for e in entries:
        parts.append("<url>")
        for f in _FIELDS:
            v = e.get(f)
            if v is not None:
                parts.append(f"<{f}>{_escape(str(v))}</{f}>")
        parts.append("</url>")
    parts.append("</urlset>")
    blob = "\n".join(parts).encode("utf-8")
    return gzip.compress(blob, mtime=0) if compress else blob


def build_sitemap_index(sitemaps: list[dict], *,
                        compress: bool = False,
                        namespace: str = _NS) -> bytes:
    """``<sitemapindex>`` bytes from [{loc, lastmod?}]."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<sitemapindex xmlns="{namespace}">']
    for e in sitemaps:
        parts.append("<sitemap>")
        for f in ("loc", "lastmod"):
            v = e.get(f)
            if v is not None:
                parts.append(f"<{f}>{_escape(str(v))}</{f}>")
        parts.append("</sitemap>")
    parts.append("</sitemapindex>")
    blob = "\n".join(parts).encode("utf-8")
    return gzip.compress(blob, mtime=0) if compress else blob


def parse_sitemap(blob: bytes) -> dict:
    """One sitemap file → {"kind": "urlset"|"sitemapindex",
    "entries": [{loc, lastmod, changefreq, priority}]} (missing
    fields None; index entries carry loc/lastmod only). Gzip is
    auto-detected."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    root = ET.parse(io.BytesIO(blob)).getroot()
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap root element: {root.tag!r}")
    entries = []
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        e = {f: None for f in _FIELDS}
        for field in child:
            name = _local(field.tag)
            if name in e:
                e[name] = (field.text or "").strip()
        entries.append(e)
    return {"kind": kind, "entries": entries}


def read_sitemaps(paths, *, concurrency: int | None = None):
    """Ray Dataset of (sitemap_path, kind, loc, lastmod, changefreq,
    priority) rows — one row per URL (or child-sitemap) entry across
    the given sitemap files."""
    import ray

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        rows = {"sitemap_path": [], "kind": [], "loc": [],
                "lastmod": [], "changefreq": [], "priority": []}
        paths_col = t["path"].to_pylist()
        for path, blob in zip(paths_col, t["bytes"].to_pylist()):
            parsed = parse_sitemap(blob)
            for e in parsed["entries"]:
                rows["sitemap_path"].append(path)
                rows["kind"].append(parsed["kind"])
                for f in _FIELDS:
                    rows[f].append(e[f])
        return pa.table({
            "sitemap_path": pa.array(rows["sitemap_path"],
                                     type=pa.string()),
            "kind": pa.array(rows["kind"], type=pa.string()),
            "loc": pa.array(rows["loc"], type=pa.string()),
            "lastmod": pa.array(rows["lastmod"], type=pa.string()),
            "changefreq": pa.array(rows["changefreq"],
                                   type=pa.string()),
            "priority": pa.array(rows["priority"], type=pa.string())})

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(parse, batch_format="pyarrow", **kwargs)
