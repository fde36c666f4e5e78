"""Exact AUC / confusion matrix (stages/evalmetrics.py), Simpson
diversity (groupstats.group_diversity), time-weighted average
(analytic.time_weighted_avg): hand-checked values + brute force."""
import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.stages.evalmetrics import (auc_exact,
                                              confusion_at_threshold)


def _ds(tbl: dict, parallelism: int = 3):
    import ray.data as rd
    return rd.from_arrow(pa.table(tbl)).repartition(parallelism)


def _brute_u2(s, y):
    pos = [a for a, b in zip(s, y) if b == 1]
    neg = [a for a, b in zip(s, y) if b == 0]
    return sum(2 * (p > n) + (p == n) for p in pos for n in neg)


def test_auc_hand_checked(ray_session):
    ds = _ds({"s": pa.array([3, 2, 1, 2], type=pa.int64()),
              "y": pa.array([1, 1, 0, 0], type=pa.int64())})
    df = auc_exact(ds, "s", "y").to_pandas()
    # pos {3,2} vs neg {1,2}: U2 = 2+2 + 2+1 = 7, auc = 7/8
    assert df["u2"][0] == 7 and df["n_pos"][0] == 2
    assert df["auc"][0] == 7 / 8


def test_auc_brute_force(ray_session):
    rng = np.random.default_rng(3)
    s = rng.integers(0, 15, size=500)
    y = rng.integers(0, 2, size=500)
    ds = _ds({"s": pa.array(s, type=pa.int64()),
              "y": pa.array(y, type=pa.int64())}, parallelism=5)
    df = auc_exact(ds, "s", "y").to_pandas()
    u2 = _brute_u2(s.tolist(), y.tolist())
    assert df["u2"][0] == u2
    npos, nneg = int(y.sum()), int((1 - y).sum())
    assert df["auc"][0] == u2 / (2 * npos * nneg)


def test_auc_distinct_guard(ray_session):
    ds = _ds({"s": pa.array(range(100), type=pa.int64()),
              "y": pa.array([i % 2 for i in range(100)],
                            type=pa.int64())})
    with pytest.raises(ValueError, match="distinct score values"):
        auc_exact(ds, "s", "y", max_distinct=10)


def test_confusion_hand_checked(ray_session):
    ds = _ds({"s": pa.array([5, 3, 1, 4, 2], type=pa.int64()),
              "y": pa.array([1, 0, 0, 1, 1], type=pa.int64())})
    df = confusion_at_threshold(ds, "s", "y", 3).to_pandas()
    # pred = s>=3 -> [1,1,0,1,0]; y = [1,0,0,1,1]
    assert (df["tp"][0], df["fp"][0], df["tn"][0], df["fn"][0]) \
        == (2, 1, 1, 1)


# ------------------------------------------------- group_diversity


def test_group_diversity_hand(ray_session):
    from prompture_ray.stages.groupstats import group_diversity
    ds = _ds({"k": ["a", "a", "a", "b", "b"],
              "v": ["x", "x", "y", "z", "z"]})
    df = group_diversity(ds, "k", "v").to_pandas() \
        .sort_values("k", ignore_index=True)
    assert list(df["n"]) == [3, 2]
    assert list(df["s2"]) == [5, 4]          # 2²+1², 2²
    assert list(df["n_distinct"]) == [2, 1]
    assert df["gini"][0] == (9 - 5) / 9 and df["gini"][1] == 0.0


def test_group_diversity_brute(ray_session):
    import pandas as pd
    from prompture_ray.stages.groupstats import group_diversity
    rng = np.random.default_rng(9)
    k = rng.integers(0, 12, size=800)
    v = rng.integers(0, 6, size=800)
    ds = _ds({"k": pa.array(k, type=pa.int64()),
              "v": pa.array(v, type=pa.int64())}, parallelism=6)
    df = group_diversity(ds, "k", "v").to_pandas() \
        .sort_values("k", ignore_index=True)
    ref = pd.DataFrame({"k": k, "v": v}).groupby("k")["v"] \
        .agg(n="size", n_distinct="nunique",
             s2=lambda x: int((x.value_counts() ** 2).sum()))
    assert list(df["n"]) == list(ref["n"])
    assert list(df["s2"]) == list(ref["s2"])
    assert list(df["n_distinct"]) == list(ref["n_distinct"])
    got = df["gini"].to_numpy()
    want = (ref["n"].to_numpy() ** 2 - ref["s2"].to_numpy()) \
        / ref["n"].to_numpy() ** 2
    assert (got == want).all()


# ------------------------------------------------- time_weighted_avg


def test_twa_hand_checked(ray_session):
    from prompture_ray.stages.analytic import time_weighted_avg
    ds = _ds({"k": pa.array([1, 1, 1, 2, 3, 3], type=pa.int64()),
              "t": pa.array([0, 5, 15, 7, 4, 4], type=pa.int64()),
              "o": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
              "v": pa.array([10, 20, 99, 5, 1, 2], type=pa.int64())})
    df = time_weighted_avg(ds, "k", "t", "o", "v").to_pandas() \
        .sort_values("k", ignore_index=True)
    # key 1: 10*5 + 20*10 = 250 over span 15; key 2 single -> dropped;
    # key 3 zero span -> dropped
    assert list(df["k"]) == [1]
    assert df["num"][0] == 250 and df["den"][0] == 15
    assert df["twa"][0] == 250 / 15


def test_twa_brute(ray_session):
    import pandas as pd
    from prompture_ray.stages.analytic import time_weighted_avg
    rng = np.random.default_rng(21)
    n = 600
    k = rng.integers(0, 25, size=n)
    t = rng.integers(0, 10_000, size=n)
    v = rng.integers(-50, 50, size=n)
    o = np.arange(n)
    ds = _ds({"k": pa.array(k, type=pa.int64()),
              "t": pa.array(t, type=pa.int64()),
              "o": pa.array(o, type=pa.int64()),
              "v": pa.array(v, type=pa.int64())}, parallelism=5)
    df = time_weighted_avg(ds, "k", "t", "o", "v").to_pandas() \
        .sort_values("k", ignore_index=True)
    ref = pd.DataFrame({"k": k, "t": t, "v": v, "o": o}) \
        .sort_values(["k", "t", "o"])
    rows = {}
    for kk, g in ref.groupby("k"):
        tt = g["t"].to_numpy()
        vv = g["v"].to_numpy()
        den = int(tt[-1] - tt[0])
        if den > 0:
            num = int((vv[:-1] * np.diff(tt)).sum())
            rows[kk] = (num, den)
    assert list(df["k"]) == sorted(rows)
    for _, r in df.iterrows():
        num, den = rows[r["k"]]
        assert r["num"] == num and r["den"] == den
        assert r["twa"] == num / den


# ------------------------------------------------- vocab_jaccard


def test_vocab_jaccard_hand(ray_session):
    from prompture_ray.stages.tfidf import vocab_jaccard
    ds = _ds({"g": ["en", "en", "fr", "de"],
              "text": ["a b c", "c d", "b c x", "zz"]})
    df = vocab_jaccard(ds, "g", "text").to_pandas() \
        .sort_values(["group_a", "group_b"], ignore_index=True)
    # en={a,b,c,d}, fr={b,c,x}, de={zz}: en∩fr={b,c} -> 2/(4+3-2)
    assert list(df["group_a"]) == ["en"]
    assert list(df["group_b"]) == ["fr"]
    assert df["inter"][0] == 2
    assert df["size_a"][0] == 4 and df["size_b"][0] == 3
    assert df["jaccard"][0] == 2 / 5


def test_vocab_jaccard_brute(ray_session):
    from prompture_ray.stages.tfidf import vocab_jaccard
    rng = np.random.default_rng(5)
    groups = ["g1", "g2", "g3", "g4"]
    texts, gs = [], []
    for _ in range(200):
        g = groups[rng.integers(0, 4)]
        toks = [f"w{rng.integers(0, 40):02d}"
                for _ in range(rng.integers(1, 8))]
        gs.append(g)
        texts.append(" ".join(toks))
    vocab = {}
    for g, t in zip(gs, texts):
        vocab.setdefault(g, set()).update(t.split())
    ds = _ds({"g": gs, "text": texts}, parallelism=5)
    df = vocab_jaccard(ds, "g", "text").to_pandas()
    got = {(r.group_a, r.group_b):
           (r.inter, r.size_a, r.size_b, r.jaccard)
           for r in df.itertuples()}
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                sa, sb = len(vocab[a]), len(vocab[b])
                assert got[(a, b)] == (inter, sa, sb,
                                       inter / (sa + sb - inter))
            else:
                assert (a, b) not in got
    assert len(got) == sum(
        1 for i, a in enumerate(groups) for b in groups[i + 1:]
        if vocab[a] & vocab[b])


# ------------------------------------------------- rolling_anomaly


def test_rolling_anomaly_brute(ray_session):
    import pandas as pd
    from prompture_ray.stages.analytic import rolling_anomaly
    rng = np.random.default_rng(31)
    n = 500
    k = rng.integers(0, 8, size=n)
    t = rng.integers(0, 100_000, size=n)
    v = rng.integers(-30, 30, size=n)
    o = np.arange(n)
    w, kk, mn = 5, 3, 3
    ds = _ds({"k": pa.array(k, type=pa.int64()),
              "t": pa.array(t, type=pa.int64()),
              "o": pa.array(o, type=pa.int64()),
              "v": pa.array(v, type=pa.int64())}, parallelism=4)
    df = rolling_anomaly(ds, "k", "t", "o", "v", window=w, k=kk,
                         min_n=mn).to_pandas() \
        .sort_values("o", ignore_index=True)
    ref = pd.DataFrame({"k": k, "t": t, "v": v, "o": o}) \
        .sort_values(["k", "t", "o"])
    exp = {}
    for key, g in ref.groupby("k"):
        vals = g["v"].tolist()
        for i, oid in enumerate(g["o"]):
            win = vals[max(0, i - w + 1):i + 1]
            nw, s, s2 = len(win), sum(win), sum(x * x for x in win)
            x = vals[i]
            flag = (nw >= mn) and \
                (nw * x - s) ** 2 > kk * kk * (nw * s2 - s * s)
            exp[oid] = (nw, s, s2, flag)
    for r in df.itertuples():
        assert (r.n_win, r.s_win, r.s2_win, r.is_anomaly) == exp[r.o]


def test_rolling_anomaly_hand(ray_session):
    from prompture_ray.stages.analytic import rolling_anomaly
    # constant run then a spike: variance 0 -> any deviation flags
    ds = _ds({"k": pa.array([1] * 5, type=pa.int64()),
              "t": pa.array(range(5), type=pa.int64()),
              "o": pa.array(range(5), type=pa.int64()),
              "v": pa.array([7, 7, 7, 7, 100], type=pa.int64())},
             parallelism=1)
    # k=1: the spike itself inflates the window variance, so pick a
    # threshold the inflated std still clears
    df = rolling_anomaly(ds, "k", "t", "o", "v", window=4, k=1,
                         min_n=2).to_pandas() \
        .sort_values("o", ignore_index=True)
    assert list(df["is_anomaly"]) == [False, False, False, False, True]
    # constant windows never flag (0 > 0 is false)
    assert df["s_win"][3] == 28 and df["s2_win"][3] == 4 * 49


# ------------------------------------------------- distinctive_terms


def test_distinctive_terms_brute(ray_session):
    import pandas as pd
    from prompture_ray.stages.tfidf import distinctive_terms
    rng = np.random.default_rng(41)
    groups = ["en", "fr", "de"]
    gs, texts = [], []
    for _ in range(150):
        g = groups[rng.integers(0, 3)]
        toks = [f"{g}w{rng.integers(0, 6)}" if rng.random() < 0.5
                else f"c{rng.integers(0, 10)}"
                for _ in range(rng.integers(2, 9))]
        gs.append(g)
        texts.append(" ".join(toks))
    ds = _ds({"g": gs, "text": texts}, parallelism=4)
    df = distinctive_terms(ds, "g", "text", k=5).to_pandas() \
        .sort_values(["group", "rk"], ignore_index=True)

    rows = []
    for g, t in zip(gs, texts):
        for tok in t.split():
            rows.append((g, tok))
    ref = pd.DataFrame(rows, columns=["g", "term"])
    cnt = ref.groupby(["g", "term"]).size().rename("c").reset_index()
    ct = cnt.groupby("term")["c"].sum()
    ng = cnt.groupby("g")["c"].sum()
    n = int(cnt["c"].sum())
    cnt["lift"] = (cnt["c"].to_numpy().astype(np.int64) * n) / (
        ng[cnt["g"]].to_numpy().astype(np.int64)
        * ct[cnt["term"]].to_numpy().astype(np.int64))
    for g in groups:
        sub = cnt[cnt["g"] == g].sort_values(
            ["lift", "term"], ascending=[False, True]).head(5)
        got = df[df["group"] == g]
        assert list(got["term"]) == list(sub["term"])
        assert (got["lift"].to_numpy()
                == sub["lift"].to_numpy()).all()
        assert list(got["rk"]) == [1, 2, 3, 4, 5]
    # join fallback path must agree exactly
    df0 = distinctive_terms(ds, "g", "text", k=5, broadcast_max=0) \
        .to_pandas().sort_values(["group", "rk"], ignore_index=True)
    assert (df0[["group", "term", "c_tg", "lift"]].to_numpy()
            == df[["group", "term", "c_tg", "lift"]].to_numpy()).all()


# ------------------------------------------------- grouped_quantiles


def test_grouped_quantiles_brute(ray_session):
    import math
    import pandas as pd
    from prompture_ray.stages.groupstats import grouped_quantiles
    rng = np.random.default_rng(29)
    n = 900
    k = rng.integers(0, 15, size=n)
    v = rng.integers(-500, 500, size=n)
    ds = _ds({"k": pa.array(k, type=pa.int64()),
              "v": pa.array(v, type=pa.int64())}, parallelism=5)
    qs = (0.25, 0.5, 0.9)
    df = grouped_quantiles(ds, "k", "v", qs=qs).to_pandas() \
        .sort_values("k", ignore_index=True)
    ref = pd.DataFrame({"k": k, "v": v})
    for r in df.itertuples():
        vals = np.sort(ref[ref["k"] == r.k]["v"].to_numpy())
        assert r.n == len(vals)
        for q, nm in zip(qs, ("q_25", "q_50", "q_90")):
            rank = math.ceil(q * len(vals))     # 1-based
            assert getattr(r, nm) == vals[rank - 1]
    assert set(df["k"]) == set(np.unique(k))


def test_grouped_quantiles_edges(ray_session):
    import pytest as _pt
    from prompture_ray.stages.groupstats import grouped_quantiles
    # singleton key: every quantile = the single value
    ds = _ds({"k": pa.array([1, 2, 2], type=pa.int64()),
              "v": pa.array([42, 5, 9], type=pa.int64())},
             parallelism=1)
    df = grouped_quantiles(ds, "k", "v", qs=(0.5, 0.99)).to_pandas() \
        .sort_values("k", ignore_index=True)
    assert df.loc[0, "q_50"] == 42 and df.loc[0, "q_99"] == 42
    # n=2, q=0.5 -> rank ceil(1.0)=1 -> lower value; q=0.99 -> rank 2
    assert df.loc[1, "q_50"] == 5 and df.loc[1, "q_99"] == 9
    with _pt.raises(ValueError, match="exact rational"):
        grouped_quantiles(ds, "k", "v", qs=(np.pi / 4,))


# ------------------------------------------------- winsorize_by_key


def test_winsorize_brute(ray_session):
    import math
    import pandas as pd
    from prompture_ray.stages.groupstats import winsorize_by_key
    rng = np.random.default_rng(37)
    n = 800
    k = rng.integers(0, 10, size=n)
    v = rng.integers(-1000, 1000, size=n)
    o = np.arange(n)
    ds = _ds({"k": pa.array(k, type=pa.int64()),
              "o": pa.array(o, type=pa.int64()),
              "v": pa.array(v, type=pa.int64())}, parallelism=4)
    df = winsorize_by_key(ds, "k", "v", lo_q=0.1, hi_q=0.9) \
        .to_pandas().sort_values("o", ignore_index=True)
    ref = pd.DataFrame({"k": k, "v": v})
    bounds = {}
    for kk, g in ref.groupby("k"):
        vals = np.sort(g["v"].to_numpy())
        lo = vals[math.ceil(0.1 * len(vals)) - 1]
        hi = vals[math.ceil(0.9 * len(vals)) - 1]
        bounds[kk] = (lo, hi)
    for r in df.itertuples():
        lo, hi = bounds[r.k]
        assert r.v_wins == min(max(r.v, lo), hi)
    # join fallback must agree exactly
    df0 = winsorize_by_key(ds, "k", "v", lo_q=0.1, hi_q=0.9,
                           broadcast_max=0).to_pandas() \
        .sort_values("o", ignore_index=True)
    assert (df0["v_wins"].to_numpy() == df["v_wins"].to_numpy()).all()


# ------------------------------------------- grouped_weighted_quantiles


def test_weighted_quantiles_brute(ray_session):
    import pandas as pd
    from prompture_ray.stages.groupstats import \
        grouped_weighted_quantiles
    rng = np.random.default_rng(43)
    n = 700
    k = rng.integers(0, 12, size=n)
    v = rng.integers(-50, 50, size=n)
    w = rng.integers(0, 20, size=n)
    ds = _ds({"k": pa.array(k, type=pa.int64()),
              "v": pa.array(v, type=pa.int64()),
              "w": pa.array(w, type=pa.int64())}, parallelism=5)
    qs = (0.25, 0.5, 0.9)
    df = grouped_weighted_quantiles(ds, "k", "v", "w", qs=qs) \
        .to_pandas().sort_values("k", ignore_index=True)
    ref = pd.DataFrame({"k": k, "v": v, "w": w})
    from fractions import Fraction
    for r in df.itertuples():
        g = ref[ref["k"] == r.k].groupby("v")["w"].sum().sort_index()
        W = int(g.sum())
        assert r.w_total == W
        cum = g.cumsum()
        for q, nm in zip(qs, ("q_25", "q_50", "q_90")):
            f = Fraction(q).limit_denominator(10_000)
            want = None
            for val, c in cum.items():
                if int(c) * f.denominator >= f.numerator * W:
                    want = val
                    break
            assert getattr(r, nm) == want
    assert set(df["k"]) == set(np.unique(k))


def test_weighted_quantiles_hand(ray_session):
    from prompture_ray.stages.groupstats import \
        grouped_weighted_quantiles
    # key 1: values 1 (w=1), 2 (w=1), 10 (w=8): median = 10
    # (cum at 2 is 2/10 < 5/10); unweighted median would be 2
    ds = _ds({"k": pa.array([1, 1, 1], type=pa.int64()),
              "v": pa.array([1, 2, 10], type=pa.int64()),
              "w": pa.array([1, 1, 8], type=pa.int64())},
             parallelism=1)
    df = grouped_weighted_quantiles(ds, "k", "v", "w", qs=(0.5,)) \
        .to_pandas()
    assert df["q_50"][0] == 10 and df["w_total"][0] == 10
