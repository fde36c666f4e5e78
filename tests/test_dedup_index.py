"""Persisted exact-dedup hash index (stages/dedup_index.py): build /
filter / flag / update / compact lifecycle; text-set semantics."""
import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.stages.dedup_index import (
    build_dedup_index, dedup_against_index, update_dedup_index,
    compact_dedup_index, read_meta)


def _ds(ids, texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))


BASE = [f"base document {i} text" for i in range(20)]


def test_lifecycle(ray_session, tmp_path):
    idx = str(tmp_path / "didx")
    meta = build_dedup_index(_ds(range(20), BASE), "text", idx,
                             n_buckets=8)
    assert meta["n_hashes"] == 20

    # wave 1: 3 dups of base, 2 fresh, 1 intra-wave dup pair
    w1 = _ds([100, 101, 102, 103, 104, 105],
             [BASE[0], BASE[7], BASE[19], "fresh one", "fresh two",
              "fresh one"])
    kept = dedup_against_index(w1, idx).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    # index filtering is vs the INDEX only — both "fresh one" copies
    # survive (intra-wave dedup is dedup_exact's job, by contract)
    assert list(kept["doc_id"]) == [103, 104, 105]

    # audit mode keeps all rows with the flag
    flagged = dedup_against_index(w1, idx, flag_col="is_new") \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(flagged["is_new"]) == [False, False, False,
                                       True, True, True]

    # update with the kept wave → second wave copies are now dups
    meta = update_dedup_index(idx, _ds(kept["doc_id"], kept["text"]))
    assert meta["n_hashes"] == 22      # 20 base + 2 distinct fresh

    w2 = _ds([200, 201, 202],
             ["fresh one", "brand new", BASE[3]])
    kept2 = dedup_against_index(w2, idx).to_pandas()
    assert list(kept2["doc_id"]) == [201]

    # compact folds delta files; membership and counts unchanged
    meta = compact_dedup_index(idx)
    assert meta["n_hashes"] == 22
    kept2b = dedup_against_index(w2, idx).to_pandas()
    assert list(kept2b["doc_id"]) == [201]
    assert read_meta(idx)["n_hashes"] == 22


def test_build_no_overwrite(ray_session, tmp_path):
    idx = str(tmp_path / "didx2")
    build_dedup_index(_ds([0], ["a"]), "text", idx, n_buckets=2)
    with pytest.raises(FileExistsError):
        build_dedup_index(_ds([0], ["a"]), "text", idx, n_buckets=2)
    build_dedup_index(_ds([1], ["b"]), "text", idx, n_buckets=2,
                      overwrite=True)
    assert read_meta(idx)["n_hashes"] == 1


def test_null_and_empty_text(ray_session, tmp_path):
    idx = str(tmp_path / "didx3")
    build_dedup_index(_ds([0, 1], ["", "x"]), "text", idx, n_buckets=2)
    import ray.data as rd
    w = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], type=pa.int64()),
        "text": pa.array([None, "", "y"], type=pa.string())}))
    kept = dedup_against_index(w, idx).to_pandas()
    # null coalesces to "" → both empty-ish rows are dups of base ""
    assert list(kept["doc_id"]) == [12]


def test_partitioned_path_equals_broadcast(ray_session, tmp_path):
    idx = str(tmp_path / "didx4")
    build_dedup_index(_ds(range(20), BASE), "text", idx, n_buckets=8)
    w = _ds([100, 101, 102, 103],
            [BASE[0], "fresh a", BASE[11], "fresh b"])
    a = dedup_against_index(w, idx).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = dedup_against_index(w, idx, broadcast_max=0).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
    assert list(a["doc_id"]) == [101, 103]
    # flag mode too
    af = dedup_against_index(w, idx, flag_col="is_new").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    bf = dedup_against_index(w, idx, flag_col="is_new",
                             broadcast_max=0).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert af.equals(bf)
