"""Bigram LM (stages/lm.py): distributed counts, add-1 smoothing,
broadcast perplexity scoring, CCNet buckets — including the
NON-CIRCULAR hand derivation (Fraction + math.log) of the planted
constants pasted into the lm_perplexity_docs oracle SQL."""
import math
from fractions import Fraction

import numpy as np
import pyarrow as pa

from prompture_ray.stages.lm import (bigram_counts, unigram_counts,
                                     train_bigram_lm, lm_score)

TRAIN = ["the cat sat on the mat",
         "dogs bark dogs bark loudly",
         "zebras graze quietly near rivers"]
SCORE = ["the cat sat", "qqq zzz www",
         "zebras graze quietly near", "the qqq mat"]
# literals pinned in LM_PERPLEXITY_SQL (queries.py) — derived below
PINNED = {0: (3, -6.3969, 8.4343, "head"),
          1: (3, -8.6793, 18.0492, "tail"),
          2: (4, -8.7528, 8.9191, "head"),
          3: (3, -7.7142, 13.0843, "middle")}
BUCKETS = (9.5, 15.0)


def _hand_model():
    uni, bi = {}, {}
    for d in TRAIN:
        ts = d.split()
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi


def _hand_score(text, uni, bi):
    """Event probabilities as exact Fractions; float path = the engine's
    (one correctly-rounded division per event, sequential log sum)."""
    V = len(uni)
    Vs, T = V + 1, sum(uni.values())
    ts = text.split()
    fr = [Fraction(uni.get(ts[0], 0) + 1, T + Vs)]
    for a, b in zip(ts, ts[1:]):
        fr.append(Fraction(bi.get((a, b), 0) + 1, uni.get(a, 0) + Vs))
    lp = 0.0
    for f in fr:
        lp += math.log(f.numerator / f.denominator)
    return lp, math.exp(-lp / len(ts))


def test_bigram_unigram_counts(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "text": pa.array(["a b a b", "b c", "x", "", None])}))
    bdf = bigram_counts(ds, "text").to_pandas()
    got = {(r["w1"], r["w2"]): int(r["cnt"]) for _, r in bdf.iterrows()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}
    udf = unigram_counts(ds, "text").to_pandas()
    ug = {r["w"]: int(r["cnt"]) for _, r in udf.iterrows()}
    assert ug == {"a": 2, "b": 3, "c": 1, "x": 1}


def test_planted_constants_derivation(ray_session):
    """Derive the oracle literals by hand arithmetic; assert the engine
    reproduces them and that every value sits far (>1e-4 relative to the
    grid) from its 4-dp rounding boundary."""
    import ray.data as rd
    uni, bi = _hand_model()
    assert (len(uni), sum(uni.values())) == (13, 16)

    train = rd.from_arrow(pa.table({"text": pa.array(TRAIN)}))
    m = train_bigram_lm(train, "text")
    assert m["v_smooth"] == 14 and m["total"] == 16

    score_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(8), type=pa.int64()),
        "text": pa.array([SCORE[i % 4] for i in range(8)])}))
    df = lm_score(score_ds, m, "text", "doc_id", buckets=BUCKETS) \
        .to_pandas().sort_values("id", ignore_index=True)
    for _, r in df.iterrows():
        v = int(r["id"]) % 4
        lp, ppl = _hand_score(SCORE[v], uni, bi)
        n, lp4, ppl4, bucket = PINNED[v]
        # hand float path vs engine float path: same divisions, libm log
        assert abs(r["logprob"] - lp) < 1e-9
        assert abs(r["ppl"] - ppl) < 1e-9
        # the pinned literals are what the hand derivation rounds to...
        assert (round(np.round(lp, 4), 6), round(np.round(ppl, 4), 6)) \
            == (lp4, ppl4)
        # ...and far from the 4-dp boundary (libm 1-ulp noise can't flip)
        for x in (abs(lp), ppl):
            assert abs(x * 1e4 - math.floor(x * 1e4) - 0.5) > 1e-2
        assert int(r["n_tokens"]) == n
        assert r["bucket"] == bucket


def test_oov_only_and_empty(ray_session):
    import ray.data as rd
    train = rd.from_arrow(pa.table({"text": pa.array(TRAIN)}))
    m = train_bigram_lm(train, "text")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["zz yy", ""])}))
    df = lm_score(ds, m, "text", "doc_id").to_pandas()
    assert list(df["id"]) == [1]          # empty text filtered
    # OOV-only: P = 1/(T+Vs) then 1/(0+Vs)
    exp = math.exp(-(math.log(1 / 30) + math.log(1 / 14)) / 2)
    assert abs(df["ppl"][0] - exp) < 1e-12


def test_block_layout_invariance(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                  "text": pa.array([SCORE[i % 4] for i in range(40)])})
    train = rd.from_arrow(pa.table({"text": pa.array(TRAIN)}))
    m = train_bigram_lm(train, "text")
    outs = []
    for nb in (1, 7):
        ds = rd.from_arrow(t).repartition(nb)
        outs.append(lm_score(ds, m, "text", "doc_id").to_pandas()
                    .sort_values("id", ignore_index=True))
    assert outs[0].equals(outs[1])


def test_real_corpus_roundtrip(ray_session):
    """CCNet shape on the real table: train on the corpus itself, score
    every doc — finite positive perplexities, vocab hit keeps ppl sane."""
    import ray.data as rd
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    m = train_bigram_lm(ds, "text")
    assert m["total"] > 0
    df = lm_score(ds, m, "text", "doc_id").to_pandas()
    assert len(df) > 0
    assert np.isfinite(df["ppl"]).all() and (df["ppl"] > 1.0).all()
    assert (df["n_tokens"] > 0).all()


def test_lm_score_append_mode(ray_session):
    import ray.data as rd
    train = rd.from_arrow(pa.table({"text": pa.array(TRAIN)}))
    m = train_bigram_lm(train, "text")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["the cat sat", "", None]),
        "extra": pa.array(["a", "b", "c"])}))
    df = lm_score(ds, m, "text", "doc_id", buckets=BUCKETS,
                  append=True).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    # all rows and original columns survive
    assert list(df["doc_id"]) == [1, 2, 3]
    assert list(df["extra"]) == ["a", "b", "c"]
    assert df["n_tokens"][0] == 3 and df["bucket"][0] == "head"
    assert list(df["n_tokens"][1:]) == [0, 0]
    assert df["ppl"][1:].isna().all()
    assert df["bucket"][1:].isna().all()


def test_top_collocations(ray_session):
    """PMI ratio top-k vs a pure-Python reference: counts, scores and
    the (score desc, w1, w2) total order; min_count filter."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter
    from prompture_ray.stages.lm import top_collocations

    texts = ["new york is big", "new york city", "big apple city",
             "new york new york", "is big is big", "city of new york"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)})).repartition(3)

    big, uni = Counter(), Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(big.values())
    scored = sorted(
        (((-cnt * n / (uni[a] * uni[b])), a, b, cnt)
         for (a, b), cnt in big.items() if cnt >= 2))
    want = [(i + 1, a, b, cnt) for i, (_, a, b, cnt)
            in enumerate(scored[:5])]

    out = top_collocations(ds, "text", k=5, min_count=2)
    got = [(int(r["rank"]), r["w1"], r["w2"], int(r["cnt"]))
           for _, r in out.iterrows()]
    assert got == want
    # scores are the exact integer-ratio division
    for _, r in out.iterrows():
        assert r["score"] == r["cnt"] * n / (uni[r["w1"]] * uni[r["w2"]])


# ---------------------------------------------------------- skipgrams


def test_skipgram_counts_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter
    from prompture_ray.stages.lm import skipgram_counts
    rng = np.random.default_rng(47)
    texts = []
    for _ in range(120):
        texts.append(" ".join(
            f"t{rng.integers(0, 12)}"
            for _ in range(rng.integers(1, 10))))
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(4)
    w = 3
    df = skipgram_counts(ds, "text", window=w).to_pandas()
    got = {(r.w1, r.w2): r.cnt for r in df.itertuples()}
    ref = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks)):
            for j in range(i + 1, min(i + w + 1, len(toks))):
                ref[(toks[i], toks[j])] += 1
    assert got == dict(ref)
    # min_count filter
    df2 = skipgram_counts(ds, "text", window=w, min_count=5) \
        .to_pandas()
    got2 = {(r.w1, r.w2): r.cnt for r in df2.itertuples()}
    assert got2 == {k: v for k, v in ref.items() if v >= 5}


def test_skipgram_window1_equals_bigrams(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.stages.lm import bigram_counts, skipgram_counts
    texts = ["a b c a b", "c c c", "x"]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(2)
    sg = skipgram_counts(ds, "text", window=1).to_pandas()
    bg = bigram_counts(ds, "text").to_pandas()
    a = {(r.w1, r.w2): r.cnt for r in sg.itertuples()}
    b = {(r.w1, r.w2): r.cnt for r in bg.itertuples()}
    assert a == b
