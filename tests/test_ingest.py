"""Composed incremental-ingestion pipeline (pipelines/ingest.py):
exact → near-dup → update across two waves."""
import hashlib

import pyarrow as pa

from prompture_ray.pipelines.ingest import ingest_wave
from prompture_ray.stages.dedup_index import build_dedup_index
from prompture_ray.stages.minhash_index import build_minhash_index


def _txt(i, salt="c", n=6):
    return "".join(hashlib.sha256(f"{salt}:{i}:{j}".encode()).hexdigest()
                   for j in range(n))


def _ds(rows):
    import ray.data as rd
    ids, texts = zip(*rows)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))


def test_two_wave_ingest(ray_session, tmp_path):
    corpus = [(i, _txt(i)) for i in range(20)]
    didx, mhidx = str(tmp_path / "d"), str(tmp_path / "m")
    build_dedup_index(_ds(corpus), "text", didx, n_buckets=4)
    build_minhash_index(_ds(corpus), "text", "doc_id", mhidx,
                        n_buckets=4)

    # wave 1: exact copy of 3, near-dup of 7 (suffix), fresh 100
    w1 = [(103, _txt(3)), (107, _txt(7) + " xyz"), (100, _txt(100, "f"))]
    kept, verdicts = ingest_wave(_ds(w1), didx, mhidx)
    v = verdicts.to_pandas().set_index("doc_id")
    assert v.loc[103, "verdict"] == "exact_dup"
    assert v.loc[107, "verdict"] == "near_dup"
    assert v.loc[107, "match_id"] == 7
    assert v.loc[100, "verdict"] == "kept"
    k = kept.to_pandas()
    assert list(k["doc_id"]) == [100]
    assert list(k.columns) == ["doc_id", "text"]   # helper cols dropped

    # wave 2 vs the UPDATED indexes: exact copy of the wave-1 kept doc,
    # near-dup of it, and a fresh doc
    w2 = [(200, _txt(100, "f")), (201, _txt(100, "f") + " xyz"),
          (202, _txt(202, "g"))]
    kept2, verdicts2 = ingest_wave(_ds(w2), didx, mhidx)
    v2 = verdicts2.to_pandas().set_index("doc_id")
    assert v2.loc[200, "verdict"] == "exact_dup"
    assert v2.loc[201, "verdict"] == "near_dup"
    assert v2.loc[201, "match_id"] == 100
    assert v2.loc[202, "verdict"] == "kept"
    assert list(kept2.to_pandas()["doc_id"]) == [202]
