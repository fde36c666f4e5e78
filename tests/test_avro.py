"""Avro object-container codec (sources/avro.py): spec-pinned encoding,
round trips, corruption detection, Dataset sink/source."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from prompture_ray.sources.avro import (MAGIC, decode_avro_file,
                                        encode_avro_file, read_avro,
                                        schema_from_arrow, write_avro,
                                        _r_long, _w_long)


def test_zigzag_varint_spec_vectors():
    """Pinned to the published Avro spec's zigzag examples:
    0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01."""
    import io
    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
               2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, enc in vectors.items():
        out = io.BytesIO()
        _w_long(out, n)
        assert out.getvalue() == enc, n
        back, pos = _r_long(enc, 0)
        assert back == n and pos == len(enc)


SCHEMA = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "s", "type": "string"},
    {"name": "x", "type": "double"},
    {"name": "ok", "type": "boolean"},
    {"name": "b", "type": "bytes"},
    {"name": "opt", "type": ["null", "long"]},
]}


def _rows(n):
    return [{"id": i, "s": f"doc {i} é", "x": i / 8.0, "ok": i % 2 == 0,
             "b": bytes([i % 256]), "opt": None if i % 3 == 0 else -i}
            for i in range(n)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    rows = _rows(2345)
    blob = encode_avro_file(SCHEMA, rows, codec=codec, block_rows=500)
    assert blob[:4] == MAGIC
    sch, back = decode_avro_file(blob)
    assert sch == SCHEMA
    assert back == rows


def test_corrupt_sync_detected():
    blob = bytearray(encode_avro_file(SCHEMA, _rows(10), codec="null"))
    blob[-5] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        decode_avro_file(bytes(blob))


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_avro_file(b"NOPE" + b"\x00" * 40)


def test_deterministic_output():
    a = encode_avro_file(SCHEMA, _rows(100))
    b = encode_avro_file(SCHEMA, _rows(100))
    assert a == b


def test_schema_from_arrow():
    t = pa.table({"i": pa.array([1], type=pa.int32()),
                  "s": pa.array(["x"]),
                  "f": pa.array([1.0], type=pa.float32()),
                  "ok": pa.array([True]),
                  "raw": pa.array([b"z"], type=pa.binary())})
    sch = schema_from_arrow(t.schema)
    types = {f["name"]: f["type"] for f in sch["fields"]}
    assert types == {"i": ["null", "long"], "s": ["null", "string"],
                     "f": ["null", "double"], "ok": ["null", "boolean"],
                     "raw": ["null", "bytes"]}
    with pytest.raises(ValueError, match="unsupported arrow"):
        schema_from_arrow(pa.table({"l": pa.array([[1]])}).schema)


def test_dataset_sink_source_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    df = pd.DataFrame({
        "id": np.arange(777, dtype="int64"),
        "s": [f"row {i}" for i in range(777)],
        "x": np.arange(777) / 4.0,
    })
    out = str(tmp_path / "avro")
    manifest = write_avro(rd.from_pandas(df).repartition(5), out) \
        .to_pandas()
    assert manifest["n_records"].sum() == 777
    assert len(manifest) == 5
    back = read_avro(out).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert back["id"].tolist() == df["id"].tolist()
    assert back["s"].tolist() == df["s"].tolist()
    assert back["x"].tolist() == df["x"].tolist()
    # rerun skips existing shards (content-derived names, same set)
    again = write_avro(rd.from_pandas(df).repartition(5), out).to_pandas()
    assert sorted(again["path"]) == sorted(manifest["path"])
