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
