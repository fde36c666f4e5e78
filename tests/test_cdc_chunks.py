"""Content-defined chunking dedup (stages/cdc_chunks.py): boundary
contract, edit locality, position-independent chunk hashing, duplicate
accounting."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.stages.cdc_chunks import (_chunk_rows, chunk_boundaries,
                                             cdc_chunk_stats)


def _rand_bytes(n: int, seed: str) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def _bounds_of(payload: bytes, **kw) -> np.ndarray:
    data = np.frombuffer(payload, dtype=np.uint8)
    offs = np.array([0, len(payload)], dtype=np.int64)
    return chunk_boundaries(data, offs, **kw)


def test_min_chunk_length_and_tiling():
    payload = _rand_bytes(20_000, "tile")
    b = _bounds_of(payload)
    assert b[0] == 0 and b[-1] == len(payload)
    lens = np.diff(b)
    assert (lens >= 48).all()          # min_len contract
    assert lens.sum() == len(payload)  # chunks tile the doc exactly
    assert len(lens) > 10              # mask_bits=8 -> ~256B chunks


def test_edit_locality_prefix_insert():
    # a prefix edit must leave every boundary after the first cut
    # beyond the edit's locality radius identical (content-defined)
    base = _rand_bytes(8_000, "loc")
    edited = b"XYZ" + base
    b1 = _bounds_of(base)
    b2 = _bounds_of(edited) - 3  # re-align to base coordinates
    # boundaries beyond the first shared cut after the locality radius
    shared1 = set(b1[b1 > 48 + 16])
    shared2 = set(b2[b2 > 48 + 16])
    # the tail boundary sets agree except possibly near the edit:
    # compare everything after the first common cut
    common = sorted(shared1 & shared2)
    assert common, "no shared cuts at all"
    first = common[0]
    assert {x for x in shared1 if x >= first} == \
        {x for x in shared2 if x >= first}


def test_chunk_hash_position_independent():
    # identical content in different documents / offsets hashes equal
    a = _rand_bytes(4_000, "pi")
    t1 = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                   "text": pa.array([a], type=pa.binary())})
    t2 = pa.table({"doc_id": pa.array([7, 2], type=pa.int64()),
                   "text": pa.array([_rand_bytes(1_111, "pad"), a],
                                    type=pa.binary())})
    r1 = _chunk_rows(t1, "text", "doc_id", 16, 8, 48)
    r2 = _chunk_rows(t2, "text", "doc_id", 16, 8, 48)
    h1 = r1["h"].to_numpy(zero_copy_only=False)
    h2 = r2.filter(pa.compute.equal(r2["doc_id"], 2))["h"] \
        .to_numpy(zero_copy_only=False)
    assert h1.tolist() == h2.tolist()


def test_short_and_empty_docs():
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array([b"", b"tiny", _rand_bytes(30, "s")],
                                   type=pa.binary())})
    r = _chunk_rows(t, "text", "doc_id", 16, 8, 48)
    df = r.to_pandas()
    # empty doc -> no rows; short docs -> exactly one whole-doc chunk
    assert sorted(df["doc_id"]) == [2, 3]
    assert df.set_index("doc_id").loc[2, "len"] == 4
    assert df.set_index("doc_id").loc[3, "len"] == 30


def test_dedup_accounting_exact_copies(ray_session):
    import ray.data as rd
    texts = {i: _rand_bytes(3_000, f"doc{i}") for i in range(6)}
    rows = [{"doc_id": i, "text": texts[i]} for i in range(6)]
    # doc 100 copies doc 2; doc 101 copies doc 100 (same content)
    rows += [{"doc_id": 100, "text": texts[2]},
             {"doc_id": 101, "text": texts[2]}]
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
        "text": pa.array([r["text"] for r in rows], type=pa.binary())})
    out = cdc_chunk_stats(rd.from_arrow(t).repartition(3),
                          "text", "doc_id").to_pandas() \
        .set_index("doc_id").sort_index()
    assert (out["n_bytes"] == 3_000).all()
    assert (out.loc[0:5, "dup_bytes"] == 0).all()
    # every chunk of the copies duplicates doc 2's (owner = min doc_id)
    assert out.loc[100, "dup_bytes"] == 3_000
    assert out.loc[101, "dup_bytes"] == 3_000
    assert out.loc[100, "n_chunks"] == out.loc[2, "n_chunks"]


def test_shared_suffix_partial_dedup(ray_session):
    import ray.data as rd
    shared = _rand_bytes(5_000, "suffix")
    a = _rand_bytes(2_000, "heada") + shared
    b = _rand_bytes(2_000, "headb") + shared
    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array([a, b], type=pa.binary())})
    out = cdc_chunk_stats(rd.from_arrow(t), "text", "doc_id") \
        .to_pandas().set_index("doc_id")
    # doc 2 recovers most of the shared suffix as duplicate bytes;
    # only the chunks straddling the head|suffix seam can differ
    assert out.loc[1, "dup_bytes"] == 0
    assert out.loc[2, "dup_bytes"] >= 5_000 - 2 * 600
    assert out.loc[2, "dup_bytes"] < 5_000


def test_layout_independence(ray_session):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array(np.arange(40), type=pa.int64()),
        "text": pa.array([_rand_bytes(800 + 13 * i, f"L{i % 9}")
                          for i in range(40)], type=pa.binary())})
    outs = []
    for parts in (1, 7):
        outs.append(cdc_chunk_stats(rd.from_arrow(t).repartition(parts),
                                    "text", "doc_id").to_pandas()
                    .sort_values("doc_id", ignore_index=True))
    assert outs[0].equals(outs[1])
