"""WebDataset-style archive shard ingestion: tar / zip files of samples.

Reference ingestion surface: /root/reference/prompture/ingestion/
(path→parser dispatch; archives are beyond-reference, per the brief's
large-scale multimodal requirement).

Large multimodal training corpora ship as directories of archive SHARDS
(tar files whose members group by basename stem: ``0001.jpg`` +
``0001.json`` + ``0001.txt`` = one sample — the WebDataset convention).
These readers express that Ray-Data-first:

- one read task per shard (``read_binary_files`` keeps each archive one
  block — shards are the parallelism unit, exactly how a 100-TB corpus
  is laid out),
- members parsed inside ``map_batches`` with the stdlib ``tarfile`` /
  ``zipfile`` modules (no files touch the driver),
- one output row per member (``read_*_files``) or per grouped SAMPLE
  (``group_samples=True``: key → {ext: payload} struct-ish columns).

``build_tar`` / ``build_zip`` are the inverses, so planted round-trip
oracles are closed-form (the WARC/PDF pattern).
"""

from __future__ import annotations

import io

import pyarrow as pa


def build_tar(members: list[tuple[str, bytes]], gz: bool = False) -> bytes:
    """[(name, payload)] → tar (optionally .tar.gz) bytes."""
    import tarfile
    buf = io.BytesIO()
    mode = "w:gz" if gz else "w"
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0              # deterministic archives
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def build_zip(members: list[tuple[str, bytes]]) -> bytes:
    """[(name, payload)] → zip bytes (stored, deterministic)."""
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, payload)
    return buf.getvalue()


def _iter_tar(blob: bytes):
    import tarfile
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
        for info in tf:
            if not info.isfile():
                continue
            f = tf.extractfile(info)
            yield info.name, (f.read() if f else b"")


def _iter_zip(blob: bytes):
    import zipfile
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            yield info.filename, zf.read(info)


def _member_rows(t: pa.Table, iter_fn) -> pa.Table:
    shards = t["path"].to_pylist()
    blobs = t["bytes"].to_pylist()
    out_shard, out_name, out_payload = [], [], []
    for shard, blob in zip(shards, blobs):
        for name, payload in iter_fn(blob):
            out_shard.append(shard)
            out_name.append(name)
            out_payload.append(payload)
    return pa.table({
        "shard": pa.array(out_shard, type=pa.string()),
        "member": pa.array(out_name, type=pa.string()),
        "payload": pa.array(out_payload, type=pa.binary()),
    })


def _sample_rows(t: pa.Table, iter_fn) -> pa.Table:
    """WebDataset grouping: members sharing a basename stem form one
    sample; each distinct extension becomes a binary column."""
    shards = t["path"].to_pylist()
    blobs = t["bytes"].to_pylist()
    rows: list[dict] = []
    for shard, blob in zip(shards, blobs):
        samples: dict[str, dict] = {}
        order: list[str] = []
        for name, payload in iter_fn(blob):
            stem, _, ext = name.rpartition(".")
            if not stem:
                stem, ext = name, ""
            key = f"{shard}::{stem}"
            if key not in samples:
                samples[key] = {"shard": shard, "key": stem}
                order.append(key)
            samples[key][ext or "_"] = payload
        rows.extend(samples[k] for k in order)
    exts = sorted({k for r in rows for k in r} - {"shard", "key"})
    cols: dict = {
        "shard": pa.array([r["shard"] for r in rows], type=pa.string()),
        "key": pa.array([r["key"] for r in rows], type=pa.string()),
    }
    for e in exts:
        cols[e] = pa.array([r.get(e) for r in rows], type=pa.binary())
    return pa.table(cols)


def read_tar_files(paths, group_samples: bool = False, **kwargs):
    """Tar shards → member rows (shard, member, payload) or WebDataset
    sample rows (shard, key, <ext> binary columns). Handles .tar and
    .tar.gz transparently (``tarfile`` mode 'r:*')."""
    import ray.data as rd
    ds = rd.read_binary_files(paths, include_paths=True, **kwargs)
    fn = _sample_rows if group_samples else _member_rows
    return ds.map_batches(lambda t: fn(t, _iter_tar),
                          batch_format="pyarrow", batch_size=4)


def read_zip_files(paths, group_samples: bool = False, **kwargs):
    """Zip shards → member or WebDataset sample rows (see
    ``read_tar_files``)."""
    import ray.data as rd
    ds = rd.read_binary_files(paths, include_paths=True, **kwargs)
    fn = _sample_rows if group_samples else _member_rows
    return ds.map_batches(lambda t: fn(t, _iter_zip),
                          batch_format="pyarrow", batch_size=4)
