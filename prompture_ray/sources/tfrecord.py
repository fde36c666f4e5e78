"""TFRecord + tf.train.Example codec, stdlib+numpy only (the training
sink format next to Parquet/WebDataset; beyond the reference, whose
dataset exporters stop at JSONL/CSV — prompture/dataset/export.py).

Wire format (public TensorFlow spec):
  record  = uint64 length (LE) | uint32 masked_crc32c(length bytes)
          | payload | uint32 masked_crc32c(payload)
  mask(c) = ((c >> 15) | (c << 17)) + 0xa282ead8  (mod 2^32)
  payload = tf.train.Example protobuf:
    Example{1: Features{1: map<string, Feature>}}
    Feature oneof: 1=BytesList{1: repeated bytes}
                   2=FloatList{1: packed float}
                   3=Int64List{1: packed int64}
Map entries are serialized in SORTED KEY ORDER — the deterministic
serialization convention, so byte output is reproducible.

Scale shape: CRC-32C is computed for a WHOLE BATCH of records in
lockstep (one vectorized table-lookup step per byte POSITION across
all records — no per-byte Python), with a slice guard that bounds the
padded matrix at ~64 MB. Protobuf assembly is per-record bytes-join
(a sink path); parsing is a sequential varint walk (validation path).
"""
from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_MASK_DELTA = 0xA282EAD8


def _crc32c_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> 1) ^ np.uint32(0x82F63B78), t >> 1)
    return t


_TABLE = _crc32c_table()


def crc32c_many(blobs: list[bytes]) -> np.ndarray:
    """CRC-32C of each blob — vectorized across the batch (records
    advance in lockstep, one table-lookup step per byte position)."""
    n = len(blobs)
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    # slice so padded matrix stays under ~64 MB
    order = np.argsort(lens, kind="stable")
    step = 0
    while step < n:
        # contiguous slice of the size-sorted order, padded ≤ 64 MB
        hi = step
        budget = 64 << 20
        while hi < n and (hi - step + 1) * max(int(lens[order[hi]]), 1) \
                <= budget:
            hi += 1
        hi = max(hi, step + 1)
        sel = order[step:hi]
        sl = lens[sel]
        m = np.zeros((len(sel), max(int(sl.max()), 1)), dtype=np.uint8)
        for r, i in enumerate(sel):
            if lens[i]:
                m[r, :lens[i]] = np.frombuffer(blobs[i], np.uint8)
        crc = np.full(len(sel), 0xFFFFFFFF, dtype=np.uint32)
        for j in range(int(sl.max())):
            act = sl > j
            c = crc[act]
            crc[act] = _TABLE[(c ^ m[act, j]) & 0xFF] ^ (c >> 8)
        out[sel] = crc ^ np.uint32(0xFFFFFFFF)
        step = hi
    return out


def crc32c(data: bytes) -> int:
    return int(crc32c_many([data])[0])


def _masked(crc: np.ndarray) -> np.ndarray:
    c = crc.astype(np.uint64)
    rot = ((c >> np.uint64(15)) | (c << np.uint64(17))) \
        & np.uint64(0xFFFFFFFF)
    return ((rot + np.uint64(_MASK_DELTA))
            & np.uint64(0xFFFFFFFF)).astype(np.uint32)


# ---------------------------------------------------------------------------
# protobuf encode (tf.train.Example)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _zigzag64(n: int) -> int:
    return n & 0xFFFFFFFFFFFFFFFF  # int64 varints use two's complement


def encode_feature(kind: str, values) -> bytes:
    if kind == "bytes":
        inner = b"".join(_ld(1, v) for v in values)
        return _ld(1, inner)
    if kind == "float":
        packed = np.asarray(values, dtype="<f4").tobytes()
        return _ld(2, _ld(1, packed))
    if kind == "int64":
        packed = b"".join(_varint(_zigzag64(int(v))) for v in values)
        return _ld(3, _ld(1, packed))
    raise ValueError(f"unknown feature kind {kind!r}")


def encode_example(features: dict) -> bytes:
    """``features``: name → (kind, list of values); sorted-key order."""
    entries = b""
    for name in sorted(features):
        kind, values = features[name]
        entry = _ld(1, name.encode()) + _ld(2, encode_feature(kind,
                                                              values))
        entries += _ld(1, entry)
    return _ld(1, entries)


def frame_records(payloads: list[bytes]) -> bytes:
    """Payloads → TFRecord byte stream (batched masked CRCs)."""
    lens = [struct.pack("<Q", len(p)) for p in payloads]
    len_crc = _masked(crc32c_many(lens))
    pay_crc = _masked(crc32c_many(payloads))
    parts = []
    for i, p in enumerate(payloads):
        parts.append(lens[i])
        parts.append(struct.pack("<I", int(len_crc[i])))
        parts.append(p)
        parts.append(struct.pack("<I", int(pay_crc[i])))
    return b"".join(parts)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def split_records(blob: bytes, verify: bool = True) -> list[bytes]:
    """TFRecord stream → payload list (CRC-checked when ``verify``)."""
    out, pos, n = [], 0, len(blob)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("tfrecord: truncated length header")
        (length,) = struct.unpack_from("<Q", blob, pos)
        (lcrc,) = struct.unpack_from("<I", blob, pos + 8)
        if pos + 16 + length > n:
            raise ValueError("tfrecord: truncated payload")
        body = blob[pos + 12:pos + 12 + length]
        (pcrc,) = struct.unpack_from("<I", blob, pos + 12 + length)
        if verify:
            exp = _masked(crc32c_many([blob[pos:pos + 8], bytes(body)]))
            if int(exp[0]) != lcrc or int(exp[1]) != pcrc:
                raise ValueError("tfrecord: CRC mismatch")
        out.append(bytes(body))
        pos += 16 + length
    return out


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _walk_fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, buf[pos:pos + ln]
            pos += ln
        elif wt == 0:
            v, pos = _read_varint(buf, pos)
            yield field, v
        elif wt == 5:
            yield field, buf[pos:pos + 4]
            pos += 4
        elif wt == 1:
            yield field, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"tfrecord: wire type {wt} unsupported")


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_example(payload: bytes) -> dict:
    """tf.train.Example bytes → {name: (kind, values)}."""
    out = {}
    for f, feats in _walk_fields(payload):
        if f != 1:
            continue
        for fe, entry in _walk_fields(feats):
            if fe != 1:
                continue
            name, feat = None, b""
            for k, v in _walk_fields(entry):
                if k == 1:
                    name = v.decode()
                elif k == 2:
                    feat = v
            for kind_f, body in _walk_fields(feat):
                for vf, v in _walk_fields(body):
                    if vf != 1:
                        continue
                    if kind_f == 1:        # BytesList: repeated bytes
                        out.setdefault(name, ("bytes", []))[1] \
                            .append(bytes(v))
                    elif kind_f == 2:      # FloatList packed
                        vals = np.frombuffer(v, "<f4").tolist()
                        out[name] = ("float", vals)
                    elif kind_f == 3:      # Int64List packed varints
                        vals, p = [], 0
                        while p < len(v):
                            x, p = _read_varint(v, p)
                            vals.append(_to_i64(x))
                        out[name] = ("int64", vals)
    return out


# ---------------------------------------------------------------------------
# Ray stages
# ---------------------------------------------------------------------------


def write_tfrecord(ds, out_dir: str, spec: dict[str, str],
                   prefix: str = "part"):
    """Sink: one ``.tfrecord`` shard per block under ``out_dir``
    (resumable partitioned output — a rerun can skip existing shards).
    ``spec``: column → kind ('bytes' strings are utf-8 encoded; scalar
    cells become single-element lists). Returns the shard manifest
    Dataset ``(path, n_records, n_bytes)``."""
    import os
    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table, ctx=None) -> pa.Table:
        payloads = []
        cols = {c: t[c].to_pylist() for c in spec}
        for r in range(len(t)):
            feats = {}
            for c, kind in spec.items():
                v = cols[c][r]
                vals = v if isinstance(v, list) else [v]
                if kind == "bytes":
                    vals = [x.encode() if isinstance(x, str) else x
                            for x in vals]
                feats[c] = (kind, vals)
            payloads.append(encode_example(feats))
        blob = frame_records(payloads)
        # content-derived shard name: a rerun over the same block
        # produces the same file and SKIPS the write (resume-safe);
        # the write itself is tmp+rename (atomic, no torn shards)
        import hashlib
        digest = hashlib.sha1(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"{prefix}-{digest}.tfrecord")
        if not (os.path.exists(path)
                and os.path.getsize(path) == len(blob)):
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([len(payloads)],
                                               type=pa.int64()),
                         "n_bytes": pa.array([len(blob)],
                                             type=pa.int64())})

    return ds.map_batches(sink, batch_format="pyarrow")


def read_tfrecord(paths, spec: dict[str, str] | None = None):
    """Source: TFRecord shards → one row per Example. ``paths`` is a
    directory or file list; each file parses inside its own task."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {}
        count = 0
        for blob in t["bytes"].to_pylist():
            for payload in split_records(blob):
                ex = decode_example(payload)
                count += 1
                for name, (kind, vals) in ex.items():
                    col = rows.setdefault(name, [None] * (count - 1))
                    col.append(vals[0] if len(vals) == 1 else vals)
                for name, col in rows.items():
                    if len(col) < count:
                        col.append(None)
        return pa.table({k: pa.array(v) for k, v in sorted(rows.items())})

    return ds.map_batches(parse, batch_format="pyarrow")
