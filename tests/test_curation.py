"""Composed curation pipeline (pipelines/curation.py) + the
NON-CIRCULAR hand derivation of the curation_pipeline_docs oracle
perplexity literals (pure-Python counts, Fraction + math.log)."""
import math
from fractions import Fraction

import numpy as np
import pyarrow as pa

REF = ["the cat and the dog sat on the mat near the tree",
       "the cat sat on the mat it’s fine",
       "el perro es una cosa para los gatos del mundo"]
SCORED = [REF[0],
          "the cat sat on the mat itâ€™s fine",  # mojibake
          REF[2],
          "the end",
          "the qqq zzz www rrr sss"]
CLEANED = [REF[0], REF[1], REF[2], "the end", "the qqq zzz www rrr sss"]
# literals pinned in CURATION_SQL (queries.py)
PINNED_PPL = {0: 10.4911, 1: 9.5395, 2: 12.4774, 3: 14.4222, 4: 19.1114}
PINNED_BUCKET = {0: "head", 1: "head", 2: "middle", 3: "middle",
                 4: "tail"}
BUCKETS = (11.0, 16.0)


def _hand_ppl(text, train_docs):
    uni, bi = {}, {}
    for d in train_docs:
        ts = d.split()
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    Vs, T = len(uni) + 1, sum(uni.values())
    ts = text.split()
    fr = [Fraction(uni.get(ts[0], 0) + 1, T + Vs)]
    for a, b in zip(ts, ts[1:]):
        fr.append(Fraction(bi.get((a, b), 0) + 1, uni.get(a, 0) + Vs))
    lp = 0.0
    for f in fr:
        lp += math.log(f.numerator / f.denominator)
    return math.exp(-lp / len(ts))


def test_hand_derivation_matches_pins():
    for v, text in enumerate(CLEANED):
        ppl = _hand_ppl(text, REF)
        assert round(np.round(ppl, 4), 6) == PINNED_PPL[v]
        # far from the 4-dp boundary: libm 1-ulp noise cannot flip it
        assert abs(ppl * 1e4 - math.floor(ppl * 1e4) - 0.5) > 1e-2
        lo, hi = BUCKETS
        b = "head" if ppl <= lo else ("middle" if ppl <= hi else "tail")
        assert b == PINNED_BUCKET[v]
        # bucket margins are wide (>0.4) relative to float noise
        assert min(abs(ppl - lo), abs(ppl - hi)) > 0.4


def test_curate_corpus(ray_session):
    import ray.data as rd
    from prompture_ray.stages.lm import train_bigram_lm
    from prompture_ray.pipelines.curation import curate_corpus
    n = 20
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array([SCORED[i % 5] for i in range(n)])}))
    model = train_bigram_lm(
        rd.from_arrow(pa.table({"text": pa.array(REF)})), "text")
    df = curate_corpus(ds, "text", "doc_id", model,
                       ppl_buckets=BUCKETS).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    for _, r in df.iterrows():
        v = int(r["doc_id"]) % 5
        assert r["lang_pred"] == ("es" if v == 2 else "en")
        assert bool(r["keep"]) == (v != 3)
        assert r["bucket"] == PINNED_BUCKET[v]
        assert abs(r["ppl"] - _hand_ppl(CLEANED[v], REF)) < 1e-9
        assert bool(r["moji_fixed"]) == (v == 1)
        assert bool(r["is_first"]) == (int(r["doc_id"]) == v)
        assert bool(r["verdict"]) == (v in (0, 1)
                                      and int(r["doc_id"]) == v)
    # exactly two survivors: the first doc of each clean English class
    assert df["verdict"].sum() == 2


def test_dedup_flag_mode(ray_session):
    import ray.data as rd
    from prompture_ray.stages.dedup import dedup_exact
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 1, 3, 2, 4], type=pa.int64()),
        "text": pa.array(["x", "x", "y", "", "y"])})).repartition(3)
    df = dedup_exact(ds, "text", "doc_id", flag_col="is_first") \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    # empty-key row dropped even in flag mode (reference semantics)
    assert list(df["doc_id"]) == [1, 3, 4, 5]
    got = dict(zip(df["doc_id"], df["is_first"]))
    assert got == {1: True, 5: False, 3: True, 4: False}
    # filter mode unchanged: kept rows == flagged-first rows
    kept = dedup_exact(ds, "text", "doc_id").to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3]
