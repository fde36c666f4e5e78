"""TFRecord codec (sources/tfrecord.py): CRC-32C vectors, framing,
tf.train.Example encode/decode round trip, disk sink + source."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.sources.tfrecord import (crc32c, crc32c_many, _masked,
                                            encode_example, decode_example,
                                            frame_records, split_records,
                                            write_tfrecord, read_tfrecord)


def test_crc32c_known_vectors():
    # published CRC-32C test vectors (RFC 3720 / kernel crypto suite)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    many = crc32c_many([b"", b"123456789", b"\x00" * 32, b"abc" * 5000])
    assert list(many[:3]) == [0, 0xE3069283, 0x8A9136AA]
    assert many[3] == crc32c(b"abc" * 5000)


def test_masked_crc_matches_tf_rule():
    c = np.array([0xE3069283], dtype=np.uint32)
    rot = ((0xE3069283 >> 15) | (0xE3069283 << 17)) & 0xFFFFFFFF
    assert int(_masked(c)[0]) == (rot + 0xA282EAD8) & 0xFFFFFFFF


def test_example_roundtrip():
    feats = {"text": ("bytes", [b"hello"]),
             "ids": ("int64", [7, -3, 2**40]),
             "score": ("float", [0.25, -1.5])}
    payload = encode_example(feats)
    back = decode_example(payload)
    assert back["text"] == ("bytes", [b"hello"])
    assert back["ids"] == ("int64", [7, -3, 2**40])
    assert back["score"][0] == "float"
    assert back["score"][1] == [0.25, -1.5]
    # deterministic: sorted-key serialization
    assert payload == encode_example(dict(reversed(list(feats.items()))))


def test_framing_roundtrip_and_corruption():
    payloads = [b"a", b"bb" * 100, b""]
    blob = frame_records(payloads)
    assert split_records(blob) == payloads
    bad = bytearray(blob)
    bad[14] ^= 0xFF                      # flip a payload byte
    with pytest.raises(ValueError, match="CRC"):
        split_records(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        split_records(blob[:-2])


def test_sink_source_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    n = 50
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)]),
        "vals": pa.array([[i, i * 2] for i in range(n)],
                         type=pa.list_(pa.int64()))})).repartition(4)
    out = str(tmp_path / "shards")
    manifest = write_tfrecord(ds, out, {"doc_id": "int64",
                                        "text": "bytes",
                                        "vals": "int64"}).to_pandas()
    assert manifest["n_records"].sum() == n
    back = read_tfrecord(out).to_pandas()
    assert len(back) == n
    back["doc_id"] = back["doc_id"].astype(int)
    back = back.sort_values("doc_id", ignore_index=True)
    for i in range(n):
        assert back["text"][i] == f"doc {i}".encode()
        assert list(back["vals"][i]) == [i, i * 2]


def test_sink_resume_skips_existing(ray_session, tmp_path):
    import os
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(20), type=pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(20)])})) \
        .repartition(2)
    out = str(tmp_path / "shards")
    spec = {"doc_id": "int64", "text": "bytes"}
    m1 = write_tfrecord(ds, out, spec).to_pandas()
    files = sorted(os.listdir(out))
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    m2 = write_tfrecord(ds, out, spec).to_pandas()
    # same content → same shard names, untouched on disk
    assert sorted(os.listdir(out)) == files
    for f in files:
        assert os.path.getmtime(os.path.join(out, f)) == mtimes[f]
    assert sorted(m1["path"]) == sorted(m2["path"])
    assert m2["n_records"].sum() == 20
