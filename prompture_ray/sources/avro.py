"""Avro Object Container File source/sink — pure-stdlib codec.

Format (Avro 1.11 spec, public): magic ``Obj\\x01``, file-metadata map
(``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker; then data
blocks of (record count, payload byte size, payload, sync). Primitives
are zigzag-varint longs, little-endian IEEE float/double, length-prefixed
string/bytes; a nullable field is the union ``["null", T]`` encoded as a
varint branch index + the value.

Supported schema subset: a top-level ``record`` whose fields are
primitives (null / boolean / int / long / float / double / string /
bytes) or ``["null", primitive]`` unions — the shapes a tabular Dataset
round-trips. Codecs: ``null`` and ``deflate`` (raw RFC-1951 via zlib).

The reference ships no Avro reader (its loaders are JSON/CSV/HTML-side,
prompture/rag/loaders); this extends the source surface the same way the
TFRecord codec does (sources/tfrecord.py), with the same resume-safe
content-named shard sink. Scale model: one file per task — Avro splits
only at sync markers, so parallelism comes from many shards, which is
what the sink produces.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive codec
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _w_long(out: io.BytesIO, n: int) -> None:
    u = _zigzag(int(n)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _r_long(buf: bytes, pos: int) -> tuple[int, int]:
    u = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _unzigzag(u), pos
        shift += 7


def _w_bytes(out: io.BytesIO, b: bytes) -> None:
    _w_long(out, len(b))
    out.write(b)


def _r_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _r_long(buf, pos)
    return buf[pos:pos + n], pos + n


def _w_value(out: io.BytesIO, typ, v) -> None:
    if isinstance(typ, list):                      # union ["null", T]
        if v is None:
            _w_long(out, typ.index("null"))
            return
        branch = 1 if typ[0] == "null" else 0
        _w_long(out, branch)
        _w_value(out, typ[branch], v)
        return
    if typ == "null":
        return
    if typ == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif typ in ("int", "long"):
        _w_long(out, v)
    elif typ == "float":
        out.write(struct.pack("<f", v))
    elif typ == "double":
        out.write(struct.pack("<d", v))
    elif typ == "string":
        _w_bytes(out, v.encode("utf-8"))
    elif typ == "bytes":
        _w_bytes(out, bytes(v))
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _r_value(buf: bytes, pos: int, typ):
    if isinstance(typ, list):
        idx, pos = _r_long(buf, pos)
        t = typ[idx]
        if t == "null":
            return None, pos
        return _r_value(buf, pos, t)
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _r_long(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        b, pos = _r_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if typ == "bytes":
        b, pos = _r_bytes(buf, pos)
        return bytes(b), pos
    raise ValueError(f"unsupported avro type {typ!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def _field_types(schema: dict) -> list[tuple[str, object]]:
    assert schema.get("type") == "record", "top-level type must be record"
    return [(f["name"], f["type"]) for f in schema["fields"]]


def _sync_of(schema_json: str) -> bytes:
    import hashlib
    return hashlib.sha1(schema_json.encode()).digest()[:16]


def encode_avro_file(schema: dict, rows: list[dict],
                     codec: str = "deflate",
                     block_rows: int = 1000) -> bytes:
    """Serialize ``rows`` (list of dicts) to one Avro container blob.
    Deterministic: the sync marker derives from the schema text."""
    assert codec in ("null", "deflate")
    fields = _field_types(schema)
    schema_json = json.dumps(schema, sort_keys=True)
    sync = _sync_of(schema_json)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": codec.encode()}
    _w_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _w_bytes(out, k.encode())
        _w_bytes(out, v)
    _w_long(out, 0)
    out.write(sync)
    for start in range(0, len(rows), block_rows):
        chunk = rows[start:start + block_rows]
        body = io.BytesIO()
        for r in chunk:
            for name, typ in fields:
                _w_value(body, typ, r.get(name))
        payload = body.getvalue()
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        _w_long(out, len(chunk))
        _w_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def decode_avro_file(blob: bytes) -> tuple[dict, list[dict]]:
    """Parse an Avro container blob → (schema, rows). Verifies magic and
    per-block sync markers."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _r_long(blob, pos)
        if n == 0:
            break
        if n < 0:                      # spec: negative count + byte size
            _, pos = _r_long(blob, pos)
            n = -n
        for _ in range(n):
            k, pos = _r_bytes(blob, pos)
            v, pos = _r_bytes(blob, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = blob[pos:pos + 16]
    pos += 16
    fields = _field_types(schema)
    rows: list[dict] = []
    while pos < len(blob):
        count, pos = _r_long(blob, pos)
        size, pos = _r_long(blob, pos)
        payload = blob[pos:pos + size]
        pos += size
        if blob[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        p = 0
        for _ in range(count):
            r = {}
            for name, typ in fields:
                r[name], p = _r_value(payload, p, typ)
            rows.append(r)
        if p != len(payload):
            raise ValueError("trailing bytes inside avro block")
    return schema, rows


# ---------------------------------------------------------------------------
# Dataset sink / source
# ---------------------------------------------------------------------------

_ARROW_TO_AVRO = {
    pa.types.is_boolean: "boolean",
    pa.types.is_integer: "long",
    pa.types.is_floating: "double",
    pa.types.is_string: "string",
    pa.types.is_binary: "bytes",
}


def schema_from_arrow(sch: pa.Schema, name: str = "row",
                      nullable: bool = True) -> dict:
    """Derive an Avro record schema from an Arrow schema (primitive
    columns; every field nullable unless ``nullable=False``)."""
    fields = []
    for f in sch:
        avro_t = None
        for pred, t in _ARROW_TO_AVRO.items():
            if pred(f.type):
                avro_t = t
                break
        if avro_t is None:
            raise ValueError(f"column {f.name}: unsupported arrow type "
                             f"{f.type} for avro")
        fields.append({"name": f.name,
                       "type": ["null", avro_t] if nullable else avro_t})
    return {"type": "record", "name": name, "fields": fields}


def write_avro(ds, out_dir: str, schema: dict | None = None,
               codec: str = "deflate", prefix: str = "part"):
    """Sink: one ``.avro`` shard per block under ``out_dir`` with
    content-derived names (rerun-skippable, tmp+rename atomic — the
    TFRecord sink contract). Returns the shard manifest Dataset."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    fixed = schema

    def sink(t: pa.Table, ctx=None) -> pa.Table:
        sch = fixed or schema_from_arrow(t.schema)
        rows = t.to_pylist()
        blob = encode_avro_file(sch, rows, codec=codec)
        import hashlib
        digest = hashlib.sha1(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"{prefix}-{digest}.avro")
        if not (os.path.exists(path)
                and os.path.getsize(path) == len(blob)):
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([len(rows)],
                                               type=pa.int64()),
                         "n_bytes": pa.array([len(blob)],
                                             type=pa.int64())})

    return ds.map_batches(sink, batch_format="pyarrow")


def read_avro(paths):
    """Source: Avro shards → rows (one file per task; sorted column
    order for a stable schema across shards)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {}
        total = 0
        for blob in t["bytes"].to_pylist():
            schema, rows = decode_avro_file(blob)
            names = [f["name"] for f in schema["fields"]]
            for r in rows:
                total += 1
                for n in names:
                    cols.setdefault(n, [None] * (total - 1)).append(r[n])
            for n, col in cols.items():
                if len(col) < total:
                    col.extend([None] * (total - len(col)))
        return pa.table({k: pa.array(v) for k, v in sorted(cols.items())})

    return ds.map_batches(parse, batch_format="pyarrow")
