"""Persisted MinHash-LSH index (stages/minhash_index.py): flags match
a brute-force agreement oracle, exact copies always flag, update picks
up deltas, short-text contract."""
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.functions.sketches import MinHasher
from prompture_ray.stages.dedup import char_shingle_hashes
from prompture_ray.stages.minhash_index import (
    build_minhash_index, minhash_index_flags, update_minhash_index,
    read_meta)


def _txt(i, salt="c", n=3):
    return "".join(hashlib.sha256(f"{salt}:{i}:{j}".encode()).hexdigest()
                   for j in range(n))


def _ds(ids, texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))


def _brute_flags(corpus, wave, n_perm=64, threshold=0.8):
    """O(n*m) reference: exact agreement of recomputed signatures."""
    mh = MinHasher(n_perm=n_perm)
    c_sigs = {i: mh.sig(char_shingle_hashes(t)) for i, t in corpus
              if char_shingle_hashes(t).size}
    out = {}
    for i, t in wave:
        sh = char_shingle_hashes(t)
        if not sh.size:
            out[i] = (False, -1, 0.0)
            continue
        s = mh.sig(sh)
        hits = sorted(
            ((float((s == cs).mean()), ci) for ci, cs in c_sigs.items()
             if (s == cs).mean() >= threshold),
            key=lambda x: (-x[0], x[1]))
        out[i] = (True, hits[0][1], hits[0][0]) if hits \
            else (False, -1, 0.0)
    return out


def test_flags_vs_brute_force(ray_session, tmp_path):
    idx = str(tmp_path / "mhidx")
    # corpus: 30 distinct docs; wave: 10 exact copies + 10 fresh +
    # 2 mutated copies (half the text replaced -> borderline)
    corpus = [(i, _txt(i)) for i in range(30)]
    wave = [(100 + i, _txt(i)) for i in range(10)]
    wave += [(200 + i, _txt(i, salt="f")) for i in range(10)]
    wave += [(300 + i, _txt(i, n=2) + _txt(i, salt="m", n=1))
             for i in range(2)]

    build_minhash_index(_ds(*zip(*corpus)), "text", "doc_id", idx,
                        n_perm=64, n_bands=8, n_buckets=4)
    got = minhash_index_flags(_ds(*zip(*wave)), idx, threshold=0.8) \
        .to_pandas().set_index("doc_id")
    exp = _brute_flags(corpus, wave, n_perm=64, threshold=0.8)

    for i, (f, m, b) in exp.items():
        row = got.loc[i]
        # candidate generation can MISS a borderline pair the brute
        # force finds (LSH S-curve) but never invents agreement: when
        # the index flags, it must match the brute-force verdict
        if row["is_dup"]:
            assert f and row["match_id"] == m
            assert row["est_jaccard"] == b
    # exact copies are GUARANTEED hits (identical sigs -> same bands)
    for i in range(10):
        assert bool(got.loc[100 + i, "is_dup"])
        assert got.loc[100 + i, "match_id"] == i
        assert got.loc[100 + i, "est_jaccard"] == 1.0
    # fresh docs never flag
    for i in range(10):
        assert not bool(got.loc[200 + i, "is_dup"])


def test_update_and_short_text(ray_session, tmp_path):
    idx = str(tmp_path / "mhidx2")
    build_minhash_index(_ds([0, 1], [_txt(0), _txt(1)]), "text",
                        "doc_id", idx, n_perm=64, n_bands=8,
                        n_buckets=4)
    assert read_meta(idx)["n_docs"] == 2

    # wave 1: one fresh -> kept, then indexed via update
    w1 = _ds([10], [_txt(10)])
    f1 = minhash_index_flags(w1, idx).to_pandas()
    assert not f1["is_dup"][0]
    update_minhash_index(idx, w1)
    assert read_meta(idx)["n_docs"] == 3

    # wave 2: copy of the delta doc now flags against the UPDATE
    f2 = minhash_index_flags(_ds([20], [_txt(10)]), idx).to_pandas()
    assert bool(f2["is_dup"][0]) and f2["match_id"][0] == 10

    # short text (no shingles): false / -1 by contract
    f3 = minhash_index_flags(_ds([30], ["ab"]), idx).to_pandas()
    assert not f3["is_dup"][0] and f3["match_id"][0] == -1


def test_build_no_overwrite(ray_session, tmp_path):
    idx = str(tmp_path / "mhidx3")
    build_minhash_index(_ds([0], [_txt(0)]), "text", "doc_id", idx,
                        n_perm=64, n_bands=8, n_buckets=2)
    with pytest.raises(FileExistsError):
        build_minhash_index(_ds([0], [_txt(0)]), "text", "doc_id", idx)


def test_compact_preserves_flags(ray_session, tmp_path):
    from prompture_ray.stages.minhash_index import compact_minhash_index
    import glob as _glob
    idx = str(tmp_path / "mhidx4")
    build_minhash_index(_ds([0, 1], [_txt(0), _txt(1)]), "text",
                        "doc_id", idx, n_perm=64, n_bands=8,
                        n_buckets=2)
    update_minhash_index(idx, _ds([10], [_txt(10)]))
    update_minhash_index(idx, _ds([11], [_txt(11)]))
    before = minhash_index_flags(
        _ds([20, 21, 22], [_txt(10), _txt(11), _txt(99, "z")]),
        idx).to_pandas()[["doc_id", "is_dup", "match_id"]]
    meta = compact_minhash_index(idx)
    assert meta["n_docs"] == 4
    # every populated bucket folded to one file
    for root in ("sigs", "bands"):
        for bdir in _glob.glob(f"{idx}/{root}/bucket=*"):
            assert len(_glob.glob(f"{bdir}/*.parquet")) == 1
    after = minhash_index_flags(
        _ds([20, 21, 22], [_txt(10), _txt(11), _txt(99, "z")]),
        idx).to_pandas()[["doc_id", "is_dup", "match_id"]]
    assert before.equals(after)
    assert list(before["is_dup"]) == [True, True, False]


def test_partitioned_flags_equal_broadcast(ray_session, tmp_path):
    from prompture_ray.stages.minhash_index import (
        minhash_index_flags_partitioned)
    idx = str(tmp_path / "mhidx5")
    corpus = [(i, _txt(i)) for i in range(30)]
    wave = [(100 + i, _txt(i)) for i in range(10)]          # copies
    wave += [(200 + i, _txt(i, salt="f")) for i in range(10)]  # fresh
    wave += [(300, _txt(5) + " xyz"), (301, "ab")]  # near-dup, short
    build_minhash_index(_ds(*zip(*corpus)), "text", "doc_id", idx,
                        n_perm=64, n_bands=8, n_buckets=4)
    cols = ["doc_id", "is_dup", "match_id", "est_jaccard"]
    a = minhash_index_flags(_ds(*zip(*wave)), idx, threshold=0.8) \
        .to_pandas().sort_values("doc_id",
                                 ignore_index=True)[cols]
    b = minhash_index_flags_partitioned(
        _ds(*zip(*wave)), idx, threshold=0.8, n_parts=4) \
        .to_pandas().sort_values("doc_id", ignore_index=True)[cols]
    assert a.equals(b)
    assert bool(a.set_index("doc_id").loc[300, "is_dup"])
