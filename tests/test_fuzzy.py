"""Fuzzy dictionary match (stages/fuzzy.py): lev_le1 kernel vs a
reference implementation, and end-to-end blocking+verify vs brute
force."""

import numpy as np
import pandas as pd
import pytest


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[lb]


def test_lev_le1_kernel_exhaustive():
    from prompture_ray.stages.fuzzy import lev_le1
    import itertools
    words = ["", "a", "b", "ab", "ba", "abc", "abd", "acc", "abcd",
             "bcd", "abe", "xabc", "abcx", "aabc", "abbc", "zzz",
             "table", "tabel", "tble", "tablee", "stable"]
    pairs = list(itertools.product(words, words))
    a = np.asarray([p[0] for p in pairs], dtype=object)
    b = np.asarray([p[1] for p in pairs], dtype=object)
    got = lev_le1(a, b)
    want = np.asarray([_lev(x, y) <= 1 for x, y in pairs])
    bad = np.where(got != want)[0]
    assert not len(bad), [(pairs[i], bool(got[i])) for i in bad[:5]]


def test_fuzzy_dict_match_vs_brute_force(ray_session):
    import ray.data as rd
    from prompture_ray.stages.fuzzy import fuzzy_dict_match
    rng = np.random.default_rng(21)
    vocab = ["table", "value", "hash", "merge", "sort", "row"]
    alpha = "abcdefghijklmnopqrstuvwxyz"
    toks = []
    for i in range(800):
        w = vocab[rng.integers(0, len(vocab))]
        op = rng.integers(0, 5)
        if op == 1 and len(w) > 1:          # delete
            p = rng.integers(0, len(w))
            w = w[:p] + w[p + 1:]
        elif op == 2:                        # insert
            p = rng.integers(0, len(w) + 1)
            w = w[:p] + alpha[rng.integers(0, 26)] + w[p:]
        elif op == 3:                        # substitute
            p = rng.integers(0, len(w))
            w = w[:p] + alpha[rng.integers(0, 26)] + w[p + 1:]
        elif op == 4:                        # garbage (2 edits)
            w = w[2:] + "zq"
        toks.append(w)
    df = pd.DataFrame({"id": np.arange(800, dtype="int64"),
                       "token": toks})
    out = fuzzy_dict_match(rd.from_pandas(df).repartition(7), "token",
                           "id", vocab).to_pandas() \
        .sort_values("id", ignore_index=True)
    truth_rows = []
    for i, tkn in enumerate(toks):
        hits = sorted(w for w in vocab if _lev(tkn, w) <= 1)
        if hits:
            truth_rows.append((i, tkn, hits[0]))
    truth = pd.DataFrame(truth_rows, columns=["id", "token", "match"])
    truth["id"] = truth["id"].astype("int64")
    pd.testing.assert_frame_equal(out, truth)
    assert len(truth)  # the generator must actually produce matches


def test_fuzzy_empty_and_unmatched(ray_session):
    import ray.data as rd
    from prompture_ray.stages.fuzzy import fuzzy_dict_match
    df = pd.DataFrame({"id": np.array([1, 2], dtype="int64"),
                       "token": ["zzzzzz", "qqq"]})
    out = fuzzy_dict_match(rd.from_pandas(df), "token", "id",
                           ["table"]).to_pandas()
    assert len(out) == 0


def test_lev_le1_unicode():
    """The uint32 grid is UCS4 — non-ASCII codepoints compare exactly."""
    from prompture_ray.stages.fuzzy import lev_le1
    a = np.asarray(["héllo", "héllo", "naïve", "日本語", "日本語x"],
                   dtype=object)
    b = np.asarray(["hello", "héllo", "naive", "日本誤", "日本語"],
                   dtype=object)
    got = lev_le1(a, b).tolist()
    assert got == [True, True, True, True, True]
    c = np.asarray(["日本語", "héllo"], dtype=object)
    d = np.asarray(["中国話", "world"], dtype=object)
    assert lev_le1(c, d).tolist() == [False, False]
