"""WARC (Web ARChive) ingestion — the Common-Crawl container format.

Pure-stdlib parser for WARC/1.0 (and 1.1) files, plain or gzip
(Common Crawl gzips one member per record; ``gzip.decompress`` handles
concatenated members). Only ``WARC-Type: response`` records yield rows;
the HTTP envelope is split off so ``html`` is the body bytes — the same
(url, warc_ts, html) row shape the flagship suite validates.

Scale shape: one Ray read task per WARC file (they are independently
compressed units), parsing inside ``map_batches`` — the driver touches
file paths only. Reference anchor: the reference ingests single HTML
files (ingestion/parsers/html.py); WARC is that, at crawl scale.
"""

from __future__ import annotations

import gzip

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def parse_warc_records(blob: bytes) -> list[dict]:
    """All response records of one WARC payload →
    [{url, warc_ts, html}] (headers case-insensitive, Content-Length
    authoritative for the payload span)."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/", pos):
            nxt = blob.find(b"WARC/", pos)
            if nxt == -1:
                break
            pos = nxt
        head_end = blob.find(_CRLF2, pos)
        if head_end == -1:
            break
        headers: dict[str, str] = {}
        for line in blob[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + len(_CRLF2)
        payload = blob[body_start:body_start + length]
        pos = body_start + length
        if headers.get("warc-type", "").lower() == "response":
            # strip the HTTP envelope if present
            if payload[:5] in (b"HTTP/",):
                http_end = payload.find(_CRLF2)
                body = payload[http_end + len(_CRLF2):] \
                    if http_end != -1 else b""
            else:
                body = payload
            out.append({
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": headers.get("warc-date", ""),
                "html": body,
            })
    return out


def build_warc(records: list[dict], compress: bool = False) -> bytes:
    """(url, warc_ts, html) rows → a well-formed WARC/1.0 byte stream
    (inverse of ``parse_warc_records``; used by tests and synth)."""
    parts = []
    for r in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + r["html"])
        head = (f"WARC/1.0\r\n"
                f"WARC-Type: response\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {r['warc_ts']}\r\n"
                f"Content-Length: {len(http)}\r\n").encode("latin-1")
        # header lines each end with \r\n already — ONE more blank line
        # terminates the header block
        parts.append(head + b"\r\n" + http + _CRLF2)
    raw = b"".join(parts)
    return gzip.compress(raw) if compress else raw


def read_warc_files(paths, extract: bool = True, **kwargs):
    """WARC files → rows (path, url, warc_ts, html [, text]): the
    crawl-scale ingestion head of the flagship pipeline."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        from prompture_ray.functions.extract_html import extract_text
        paths_, urls, tss, htmls, texts = [], [], [], [], []
        for path, blob in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            for rec in parse_warc_records(blob):
                paths_.append(path)
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
                if extract:
                    texts.append(extract_text(rec["html"]))
        cols = {
            "path": pa.array(paths_, type=pa.string()),
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.string()),
            "html": pa.array(htmls, type=pa.binary()),
        }
        if extract:
            cols["text"] = pa.array(texts, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=8)
