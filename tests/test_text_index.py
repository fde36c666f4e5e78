"""Persisted BM25 text index: build once, search from pruned bucket reads;
results must match the scan-based bm25_topk."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd
    texts = [
        "hash join beats nested loop join",
        "merge sort and hash partitioning",
        "stream processing with watermarks",
        "the quick brown fox",
        "hash hash hash everywhere",
        "",
        "join the stream of events",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    }))


def test_text_index_matches_scan_bm25(corpus, tmp_path):
    from prompture_ray.stages.similarity import bm25_topk
    from prompture_ray.stages.text_index import (
        build_text_index, text_index_search)
    idx = str(tmp_path / "tidx")
    meta = build_text_index(corpus, "text", "doc_id", idx, n_buckets=8)
    assert meta["n_docs"] == 7
    assert meta["total_len"] == sum(len(s.split()) for s in [
        "hash join beats nested loop join",
        "merge sort and hash partitioning",
        "stream processing with watermarks",
        "the quick brown fox",
        "hash hash hash everywhere",
        "",
        "join the stream of events"])
    for q in ("hash join", "stream", "quick brown", "absent term",
              "hash hash"):
        want = bm25_topk(corpus, "text", "doc_id", q, k=5)
        got = text_index_search(idx, q, k=5)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert np.allclose(got["bm25"].to_numpy(),
                           want["bm25"].to_numpy()), q


def test_text_index_rebuild_guard(corpus, tmp_path):
    from prompture_ray.stages.text_index import build_text_index
    idx = str(tmp_path / "tidx2")
    build_text_index(corpus, "text", "doc_id", idx)
    with pytest.raises(FileExistsError):
        build_text_index(corpus, "text", "doc_id", idx)
    meta = build_text_index(corpus, "text", "doc_id", idx, overwrite=True)
    assert meta["n_docs"] == 7


def test_incremental_update_equals_rebuild(corpus, tmp_path):
    """build(evens) + update(add odds, remove [0,3,6]) must give the SAME
    search results (scores included) as a from-scratch build over the
    live corpus — catches stale df/n_docs/avgdl, missing delta files,
    and unfiltered tombstones. Doc 3 is in BOTH remove_ids and add_ds:
    generational tombstones (ADVICE r4) make that an UPDATE — its
    same-call delta postings survive — so the live corpus excludes only
    the removed-and-not-re-added ids {0, 6}."""
    import pyarrow.compute as pc
    from prompture_ray.stages.text_index import (
        build_text_index, update_text_index, text_index_search)

    def par(r):
        return lambda t: t.filter(pc.equal(
            pc.subtract(t["doc_id"], pc.multiply(
                pc.divide(t["doc_id"], 2), 2)), r))

    inc_dir = str(tmp_path / "inc")
    build_text_index(corpus.map_batches(par(0), batch_format="pyarrow"),
                     "text", "doc_id", inc_dir, n_buckets=8)
    removed = [0, 3, 6]
    meta = update_text_index(
        inc_dir, add_ds=corpus.map_batches(par(1),
                                           batch_format="pyarrow"),
        remove_ids=removed)

    gone = [0, 6]   # 3 was re-added in the same call → updated, live
    ref_dir = str(tmp_path / "ref")
    live = corpus.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(
            t["doc_id"], value_set=pa.array(gone, type=pa.int64())))),
        batch_format="pyarrow")
    ref_meta = build_text_index(live, "text", "doc_id", ref_dir,
                                n_buckets=8)
    assert meta["n_docs"] == ref_meta["n_docs"]
    assert meta["avgdl"] == ref_meta["avgdl"]
    for q in ["hash join stream", "merge", "fox the"]:
        a = text_index_search(inc_dir, q, k=10)
        b = text_index_search(ref_dir, q, k=10)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q
        assert np.allclose(a["bm25"], b["bm25"], rtol=0, atol=0), q
    # removed-and-not-re-added docs never surface
    hits = text_index_search(inc_dir, "hash join stream", k=10)
    assert not set(hits["doc_id"]) & set(gone)


def test_update_replaces_document_text(corpus, tmp_path):
    """ADVICE r4 repro: remove_ids + add_ds for the SAME doc_id in one
    call must UPDATE the document — n_docs unchanged, the NEW text
    searchable, the OLD text gone — not silently delete it. A LATER
    remove-only call must then kill the updated copy too."""
    import ray.data as rd
    from prompture_ray.stages.text_index import (
        build_text_index, update_text_index, text_index_search)

    d = str(tmp_path / "upd")
    build_text_index(corpus, "text", "doc_id", d, n_buckets=8)
    new0 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["zanzibar spice markets"])}))
    meta = update_text_index(d, add_ds=new0, remove_ids=[0])
    assert meta["n_docs"] == 7          # updated, not deleted
    got = text_index_search(d, "zanzibar", k=5)
    assert got["doc_id"].tolist() == [0]
    old = text_index_search(d, "beats nested loop", k=5)
    assert 0 not in set(old["doc_id"])  # old text no longer matches
    # a tombstone issued AFTER the update kills the updated copy
    meta2 = update_text_index(d, remove_ids=[0])
    assert meta2["n_docs"] == 6
    assert len(text_index_search(d, "zanzibar", k=5)) == 0


def test_compaction_crash_recovery(corpus, tmp_path):
    """compact_text_index renames each bucket aside (bucket=K.old)
    before promoting the rewrite — a crash between the two steps leaves
    a complete bucket under ONE of the two names. Searches must fall
    back to the .old dir, and the next compaction must recover it."""
    import os, glob, shutil
    from prompture_ray.stages.text_index import (
        build_text_index, compact_text_index, text_index_search)

    d = str(tmp_path / "crash")
    build_text_index(corpus, "text", "doc_id", d, n_buckets=8)
    before = {q: text_index_search(d, q, k=10)
              for q in ["hash join stream", "merge", "fox"]}
    # simulate the crash window for every bucket: primary renamed aside,
    # replacement not yet promoted (stale .compact leftovers included)
    for bdir in glob.glob(os.path.join(d, "bucket=*")):
        shutil.copytree(bdir, bdir + ".compact")
        os.replace(bdir, bdir + ".old")
    for q, b in before.items():
        a = text_index_search(d, q, k=10)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q
        assert np.allclose(a["bm25"], b["bm25"], rtol=0, atol=0), q
    compact_text_index(d)
    assert not glob.glob(os.path.join(d, "bucket=*.old"))
    assert not glob.glob(os.path.join(d, "bucket=*.compact"))
    for q, b in before.items():
        a = text_index_search(d, q, k=10)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q
        assert np.allclose(a["bm25"], b["bm25"], rtol=0, atol=0), q


def test_update_then_remove_only(corpus, tmp_path):
    from prompture_ray.stages.text_index import (
        build_text_index, update_text_index, text_index_search)
    d = str(tmp_path / "r")
    build_text_index(corpus, "text", "doc_id", d, n_buckets=8)
    update_text_index(d, remove_ids=[4])      # the 'hash hash hash' doc
    out = text_index_search(d, "hash", k=10)
    assert 4 not in set(out["doc_id"])
    assert len(out) > 0


def test_compaction_preserves_results(corpus, tmp_path):
    import os, glob
    import pyarrow.compute as pc
    from prompture_ray.stages.text_index import (
        build_text_index, update_text_index, compact_text_index,
        text_index_search, _tombstone_ids)

    d = str(tmp_path / "c")
    build_text_index(corpus.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 4)),
        batch_format="pyarrow"), "text", "doc_id", d, n_buckets=8)
    update_text_index(d, add_ds=corpus.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 4)),
        batch_format="pyarrow"))
    # remove in a SECOND call so the tombstone's generation covers the
    # delta that added doc 4 (same-call remove+add would UPDATE it)
    update_text_index(d, remove_ids=[1, 4])
    before = {q: text_index_search(d, q, k=10)
              for q in ["hash join stream", "merge", "fox"]}
    n_files_before = len(glob.glob(os.path.join(d, "bucket=*",
                                                "*.parquet")))
    meta = compact_text_index(d)
    assert len(_tombstone_ids(d)) == 0
    n_files_after = len(glob.glob(os.path.join(d, "bucket=*",
                                               "*.parquet")))
    assert n_files_after <= n_files_before
    for q, b in before.items():
        a = text_index_search(d, q, k=10)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q
        assert np.allclose(a["bm25"], b["bm25"], rtol=0, atol=0), q
    assert meta["n_docs"] == 5  # 7 docs - 2 removed


def test_phrase_search(corpus, tmp_path):
    from prompture_ray.stages.text_index import (
        build_text_index, text_index_phrase_search)
    d = str(tmp_path / "p")
    build_text_index(corpus, "text", "doc_id", d, n_buckets=8)
    out = text_index_phrase_search(d, "hash join", corpus).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    # doc 0: "hash join beats nested loop join" -> 1 occurrence;
    # doc 4 has hash×3 but never followed by join; doc 6 has join
    # without preceding hash
    assert out["doc_id"].tolist() == [0]
    assert out["n_occ"].tolist() == [1]
    # tri-gram phrase spanning doc 0 only
    out3 = text_index_phrase_search(d, "nested loop join",
                                    corpus).to_pandas()
    assert out3["doc_id"].tolist() == [0]
    # repeated-token phrase: "hash hash" occurs twice (overlapping) in
    # doc 4 ("hash hash hash everywhere")
    out2 = text_index_phrase_search(d, "hash hash", corpus).to_pandas()
    assert out2["doc_id"].tolist() == [4]
    assert out2["n_occ"].tolist() == [2]
    # phrase whose words exist but never adjacently -> empty
    none = text_index_phrase_search(d, "join hash", corpus).to_pandas()
    assert len(none) == 0
