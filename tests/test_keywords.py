"""RAKE word scores, Markov transitions, Benford digit profile
(stages/keywords.py, userpath.transition_counts,
stats.leading_digit_counts)."""

import numpy as np
import pandas as pd


def _mk(df: pd.DataFrame):
    import ray.data as rd
    return rd.from_pandas(df).repartition(5)


def test_rake_hand_values(ray_session):
    from prompture_ray.stages.keywords import rake_word_scores
    # doc1 phrases: [fast key order] [sort] ; doc2: [key] [key sort]
    df = pd.DataFrame({"text": [
        "the fast key order a sort",
        "key the key sort",
        "",
    ]})
    out = rake_word_scores(_mk(df), "text").to_pandas() \
        .set_index("word").sort_index()
    # freq: fast 1, key 3, order 1, sort 2
    assert out["freq"].to_dict() == {
        "fast": 1, "key": 3, "order": 1, "sort": 2}
    # deg: fast 3; key 3 (run1) + 1 + 2 = 6; order 3; sort 1 + 2 = 3
    assert out["deg"].to_dict() == {
        "fast": 3, "key": 6, "order": 3, "sort": 3}
    assert out.loc["key", "score"] == 2.0
    assert out.loc["sort", "score"] == 1.5


def test_rake_min_freq_and_stopword_only_doc(ray_session):
    from prompture_ray.stages.keywords import rake_word_scores
    df = pd.DataFrame({"text": ["the a the", "big big data"]})
    out = rake_word_scores(_mk(df), "text", min_freq=2).to_pandas()
    assert out["word"].tolist() == ["big"]
    assert out["deg"].tolist() == [6]  # two occurrences in a 3-phrase


def test_transition_counts_hand_values(ray_session):
    from prompture_ray.stages.userpath import transition_counts
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3],
        "ts": [10, 20, 30, 5, 6, 1],
        "tie": [0, 1, 2, 3, 4, 5],
        "t": ["A", "B", "A", "A", "B", "C"],
    })
    out = transition_counts(_mk(df), "u", "ts", "tie", "t") \
        .to_pandas().sort_values(["from_type", "to_type"]) \
        .reset_index(drop=True)
    # pairs: u1: A->B, B->A ; u2: A->B ; u3 none
    assert list(map(tuple, out[["from_type", "to_type", "cnt"]]
                    .itertuples(index=False))) == [
        ("A", "B", 2), ("B", "A", 1)]
    assert out["prob"].tolist() == [1.0, 1.0]


def test_transition_probs_normalize_per_from(ray_session):
    from prompture_ray.stages.userpath import transition_counts
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "u": rng.integers(0, 40, n),
        "ts": rng.integers(0, 10**6, n),
        "tie": np.arange(n),
        "t": rng.choice(list("ABCD"), n),
    })
    out = transition_counts(_mk(df), "u", "ts", "tie", "t").to_pandas()
    sums = out.groupby("from_type")["prob"].sum()
    assert np.allclose(sums.to_numpy(), 1.0)
    # brute-force counts
    brute = {}
    for _, g in df.sort_values(["ts", "tie"]).groupby("u"):
        ts = g["t"].tolist()
        for a, b in zip(ts, ts[1:]):
            brute[(a, b)] = brute.get((a, b), 0) + 1
    got = {(r.from_type, r.to_type): r.cnt
           for r in out.itertuples(index=False)}
    assert got == brute


def test_leading_digit_counts(ray_session):
    from prompture_ray.stages.stats import leading_digit_counts
    df = pd.DataFrame({
        "v": [1, 19, 123, 2, 25, 9, 900, 0, -5],
        "g": ["x", "x", "x", "x", "y", "y", "y", "y", "y"],
    })
    glob = leading_digit_counts(_mk(df), "v").to_pandas() \
        .set_index("digit")
    # zeros/negatives excluded; digits: 1,1,1,2,2,9,9
    assert glob.loc["1", "cnt"] == 3
    assert glob.loc["2", "cnt"] == 2
    assert glob.loc["9", "cnt"] == 2
    assert np.isclose(glob["prop"].sum(), 1.0)
    assert glob["prop"].tolist() == [c / 7 for c in glob["cnt"].tolist()]
    byg = leading_digit_counts(_mk(df), "v", "g").to_pandas()
    x = byg[byg["grp"] == "x"].set_index("digit")
    assert x.loc["1", "cnt"] == 3 and x.loc["2", "cnt"] == 1
    assert x["prop"].tolist() == [c / 4 for c in x["cnt"].tolist()]


def test_reference_rank_matches_bruteforce(ray_session):
    import ray.data as rd
    from prompture_ray.stages.stats import reference_rank
    rng = np.random.default_rng(47)
    probe = pd.DataFrame({"id": np.arange(500),
                          "v": rng.integers(0, 120, 500)})
    ref = pd.DataFrame({"r": rng.integers(10, 100, 800)})
    out = reference_rank(rd.from_pandas(probe).repartition(5), "v",
                         rd.from_pandas(ref).repartition(3), "r") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    rs = np.sort(ref["r"].to_numpy())
    for row in out.itertuples(index=False):
        le = int((rs <= row.v).sum())
        assert row.ref_rank_n == le
        assert row.ref_rank == le / len(rs)
