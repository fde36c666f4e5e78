import numpy as np
import pyarrow as pa

from prompture_ray.stages.bpe import (bpe_segment, train_bpe,
                                      train_bpe_from_counts,
                                      bpe_encode_counts)


def test_train_bpe_sennrich_example():
    # Sennrich et al. 2016 vocabulary; merges hand-derived under the
    # (count desc, pair lexicographic asc) tie-break
    words = ["low", "lower", "newest", "widest"]
    counts = [5, 2, 6, 3]
    merges = train_bpe_from_counts(words, counts, 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                      ("l", "o"), ("lo", "w")]


def test_segment_and_unseen_word():
    words = ["low", "lower", "newest", "widest"]
    counts = [2, 1, 1, 1]
    merges = train_bpe_from_counts(words, counts, 8)
    # hand-derived for this balanced corpus
    assert merges == [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"),
                      ("est", "</w>"), ("low", "</w>"),
                      ("d", "est</w>"), ("e", "r")]
    ranks = {m: i for i, m in enumerate(merges)}
    cache = {}
    assert bpe_segment("low", ranks, cache) == ("low</w>",)
    assert bpe_segment("lower", ranks, cache) == ("low", "er", "</w>")
    assert bpe_segment("newest", ranks, cache) == ("n", "e", "w",
                                                   "est</w>")
    assert bpe_segment("widest", ranks, cache) == ("w", "i", "dest</w>")
    # unseen word generalizes through learned merges
    assert bpe_segment("lowest", ranks, cache) == ("low", "est</w>")
    # segments always reassemble the word
    for w in words + ["lowest", "zzz"]:
        segs = bpe_segment(w, ranks, cache)
        assert "".join(segs).replace("</w>", "") == w


def test_word_counts_min_count_filter(ray_session):
    """min_count truncates the lexicon DISTRIBUTED (before the driver
    collect) — the scale lever for corpora whose hapax tokens outgrow
    max_words — and merge learning on the truncated lexicon matches
    learning on the full one when hapaxes can't win a merge."""
    import ray.data as rd
    from prompture_ray.stages.bpe import bpe_word_counts
    ds = rd.from_arrow(pa.table({"text": pa.array(
        ["low low newest", "low newest", "hapax1 low", "hapax2 newest"])}))
    w_all, c_all = bpe_word_counts(ds, "text")
    assert sorted(w_all) == ["hapax1", "hapax2", "low", "newest"]
    w2, c2 = bpe_word_counts(ds, "text", min_count=2)
    got = dict(zip(w2, c2.tolist()))
    assert got == {"low": 4, "newest": 3}
    m_full = train_bpe_from_counts(w_all, c_all, 4)
    m_trunc = train_bpe_from_counts(w2, c2, 4)
    assert m_full == m_trunc


def test_distributed_train_and_encode(ray_session):
    import ray.data as rd
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(7), type=pa.int64()),
        "text": pa.array(["low low lower newest widest"] * 7)}))
    merges = train_bpe(train, "text", 8)
    assert merges[:2] == [("l", "o"), ("lo", "w")]

    enc_texts = ["low low", "lowest", "", "newest widest newest"]
    enc = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(enc_texts)}))
    df = bpe_encode_counts(enc, "text", "doc_id", merges) \
        .to_pandas().sort_values("id", ignore_index=True)
    # empty doc dropped; counts from the hand-derived segmentations
    assert df["id"].tolist() == [0, 1, 3]
    assert df["n_words"].tolist() == [2, 1, 3]
    assert df["n_bpe_tokens"].tolist() == [2, 2, 11]


def test_chunk_bpe_tokens():
    from prompture_ray.stages.chunk import chunk_bpe_tokens
    words = ["low", "lower", "newest", "widest"]
    merges = train_bpe_from_counts(words, [2, 1, 1, 1], 8)
    # costs: low=1 lower=3 newest=4 widest=3 lowest=2
    text = "low lower newest widest lowest low"
    out = chunk_bpe_tokens(text, n_tokens=5, merges=merges)
    # greedy fill: [low(1) lower(3)]=4, +newest(4)>5 -> close;
    # [newest(4)]=4, +widest(3)>5 -> close; [widest(3) lowest(2)]=5,
    # +low(1)>5 -> close; [low]
    assert out == ["low lower", "newest", "widest lowest", "low"]
    assert " ".join(out) == text          # overlap=0 is lossless
    # budget-overlap carries trailing words
    out2 = chunk_bpe_tokens(text, n_tokens=5, overlap=1, merges=merges)
    assert out2[1].startswith("newest")   # lower(3) > 1: nothing carried
    assert chunk_bpe_tokens("", n_tokens=5, merges=merges) == []
    # a single over-budget word still emits
    assert chunk_bpe_tokens("newest", n_tokens=2, merges=merges) == \
        ["newest"]
