"""Group-prior / exact-nunique (stages/groupstats.py), KWIC
concordance (stages/concordance.py) and degree_table (stages/graph.py):
hand-checked values, path equality, edge cases."""
import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.stages.concordance import keyword_contexts
from prompture_ray.stages.groupstats import exact_nunique, group_prior
from prompture_ray.stages.graph import degree_table


def _ds(tbl: dict, parallelism: int = 2):
    import ray.data as rd
    t = pa.table(tbl)
    return rd.from_arrow(t).repartition(parallelism)


# ---------------------------------------------------------------- KWIC


def test_kwic_hand_checked(ray_session):
    ds = _ds({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
              "text": ["the cat sat on the mat",
                       "cathedral catcat",
                       "no hits here"]}, parallelism=1)
    df = keyword_contexts(ds, "cat", window=4).to_pandas() \
        .sort_values(["doc_id", "pos"], ignore_index=True)
    # doc1: "cat" at 1-based pos 5; doc2: pos 1 (cathedral), 11, 14
    assert list(df["doc_id"]) == [1, 2, 2, 2]
    assert list(df["pos"]) == [5, 1, 11, 14]
    r0 = df.iloc[0]
    assert r0["left_ctx"] == "the " and r0["right_ctx"] == " sat"
    # boundary truncation, never padded
    r1 = df.iloc[1]
    assert r1["left_ctx"] == "" and r1["right_ctx"] == "hedr"


def test_kwic_overlapping_and_batch_boundary(ray_session):
    # overlapping matches: "aaaa" contains "aa" at pos 1,2,3
    ds = _ds({"doc_id": pa.array([7], type=pa.int64()),
              "text": ["aaaa"]}, parallelism=1)
    df = keyword_contexts(ds, "aa", window=2).to_pandas()
    assert list(df["pos"]) == [1, 2, 3]
    # needle split across two docs in one batch must NOT match: doc A
    # ends with "ca", doc B starts with "t" — separator blocks it
    ds2 = _ds({"doc_id": pa.array([1, 2], type=pa.int64()),
               "text": ["ends ca", "t starts"]}, parallelism=1)
    assert keyword_contexts(ds2, "cat").count() == 0


def test_kwic_validation(ray_session):
    ds = _ds({"doc_id": pa.array([1], type=pa.int64()), "text": ["x"]})
    with pytest.raises(ValueError):
        keyword_contexts(ds, "")
    with pytest.raises(ValueError):
        keyword_contexts(ds, "a\x00b")


# --------------------------------------------------------- group_prior


_GP = {"doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
       "src": ["a", "a", "a", "b", "b"],
       "v": pa.array([10, 20, 60, 5, 7], type=pa.int64())}
# group a: n=3 sum=90; group b: n=2 sum=12
# pseudo_count=2, pseudo_sum=8 → prior a = 98/5, prior b = 20/4


def test_group_prior_hand_checked(ray_session):
    df = group_prior(_ds(_GP), "src", "v",
                     pseudo_count=2, pseudo_sum=8) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(df["n_grp"]) == [3, 3, 3, 2, 2]
    assert list(df["sum_grp"]) == [90, 90, 90, 12, 12]
    assert list(df["prior"]) == [98 / 5] * 3 + [20 / 4] * 2
    # above: v*(n+K) > sum+M → a: v*5>98 → 10*5=50 no, 20*5=100 yes,
    # 60*5=300 yes; b: v*4>20 → 5*4=20 no (strict), 7*4=28 yes
    assert list(df["above_prior"]) == [False, True, True, False, True]


def test_group_prior_path_equality(ray_session):
    cols = ["doc_id", "n_grp", "sum_grp", "prior", "above_prior"]
    a = group_prior(_ds(_GP), "src", "v", pseudo_count=2,
                    pseudo_sum=8).to_pandas() \
        .sort_values("doc_id", ignore_index=True)[cols]
    b = group_prior(_ds(_GP), "src", "v", pseudo_count=2,
                    pseudo_sum=8, broadcast_max=0).to_pandas() \
        .sort_values("doc_id", ignore_index=True)[cols]
    assert a.equals(b)


def test_group_prior_null_key_raises(ray_session):
    ds = _ds({"doc_id": pa.array([0, 1], type=pa.int64()),
              "src": pa.array(["a", None], type=pa.string()),
              "v": pa.array([1, 2], type=pa.int64())}, parallelism=1)
    with pytest.raises(Exception):
        group_prior(ds, "src", "v").to_pandas()


# -------------------------------------------------------- exact_nunique


def test_exact_nunique(ray_session):
    ds = _ds({"k": ["x", "x", "x", "y", "y"],
              "u": pa.array([1, 1, 2, 3, 3], type=pa.int64())},
             parallelism=3)
    df = exact_nunique(ds, "k", "u").to_pandas() \
        .sort_values("k", ignore_index=True)
    assert list(df["k"]) == ["x", "y"]
    assert list(df["n_distinct"]) == [2, 1]


def test_exact_nunique_cross_block_dupes(ray_session):
    # the same (k, u) pair in every block must count once
    ds = _ds({"k": ["x"] * 8, "u": pa.array([5] * 8, type=pa.int64())},
             parallelism=4)
    df = exact_nunique(ds, "k", "u").to_pandas()
    assert list(df["n_distinct"]) == [1]


# --------------------------------------------------------- degree_table


def test_degree_table(ray_session):
    # 1→2, 1→3, 2→3, 3→1: out 1:2 2:1 3:1; in 1:1 2:1 3:2
    ds = _ds({"src": pa.array([1, 1, 2, 3], type=pa.int64()),
              "dst": pa.array([2, 3, 3, 1], type=pa.int64())},
             parallelism=2)
    df = degree_table(ds).to_pandas().sort_values(
        "node", ignore_index=True)
    assert list(df["node"]) == [1, 2, 3]
    assert list(df["out_deg"]) == [2, 1, 1]
    assert list(df["in_deg"]) == [1, 1, 2]


def test_degree_table_sink_and_source_nodes(ray_session):
    # 10→20 only: 10 is pure source (in 0), 20 pure sink (out 0)
    ds = _ds({"src": pa.array([10], type=pa.int64()),
              "dst": pa.array([20], type=pa.int64())}, parallelism=1)
    df = degree_table(ds).to_pandas().sort_values(
        "node", ignore_index=True)
    assert list(df["node"]) == [10, 20]
    assert list(df["out_deg"]) == [1, 0]
    assert list(df["in_deg"]) == [0, 1]


# --------------------------------------------- multi-needle concordance


def test_kwic_multi(ray_session):
    from prompture_ray.stages.concordance import keyword_contexts_multi
    ds = _ds({"doc_id": pa.array([1, 2], type=pa.int64()),
              "text": ["key and table and key", "table only"]},
             parallelism=1)
    df = keyword_contexts_multi(ds, ["key", "table"], window=3) \
        .to_pandas().sort_values(["doc_id", "term", "pos"],
                                 ignore_index=True)
    assert list(df["term"]) == ["key", "key", "table", "table"]
    assert list(df["pos"]) == [1, 19, 9, 1]
    assert df.iloc[0]["left_ctx"] == "" and df.iloc[0]["right_ctx"] == " an"
    with __import__("pytest").raises(ValueError):
        keyword_contexts_multi(ds, [])


# -------------------------------------------------- anchor text extract


def test_extract_anchor_texts(ray_session):
    from prompture_ray.stages.graph import extract_anchor_texts
    ds = _ds({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
              "html": ['<a href="https://x/">Click  here</a>'
                       '<a class="z" href="/rel">r</a>',
                       '<a href="https://y/"><b>nested</b></a>',
                       'no links']}, parallelism=1)
    df = extract_anchor_texts(ds, "html", "doc_id").to_pandas() \
        .sort_values(["src", "href"], ignore_index=True)
    assert list(df["src"]) == [1, 1, 2]
    assert list(df["href"]) == ["/rel", "https://x/", "https://y/"]
    # anchor text = run up to first '<', stripped; nested markup -> ""
    assert list(df["anchor"]) == ["r", "Click  here", ""]


# -------------------------------------------------- grouped outliers


def test_grouped_outliers_hand_values(ray_session):
    from prompture_ray.stages.groupstats import grouped_outliers
    import pandas as pd
    # key "a": v = [1, 2, 3, 4, 100] -> med 3, m2=6; d=|2v-6| =
    # [4,2,0,2,194] -> median 2, mad4=4 -> MAD=1; |v-med|>3*MAD flags
    # only 100 (2*194 > 3*4). key "b": constant -> mad4=0, no flags.
    ds = _ds({"k": pa.array(["a"] * 5 + ["b"] * 3),
              "v": pa.array([1, 2, 3, 4, 100, 7, 7, 7],
                            type=pa.int64())}, parallelism=3)
    df = grouped_outliers(ds, "k", "v", k=3).to_pandas() \
        .sort_values(["k", "v"], ignore_index=True)
    a = df[df["k"] == "a"]
    assert a["m2"].tolist() == [6] * 5
    assert a["mad4"].tolist() == [4] * 5
    assert a["is_outlier"].tolist() == [False] * 4 + [True]
    b = df[df["k"] == "b"]
    assert b["m2"].tolist() == [14] * 3
    assert b["mad4"].tolist() == [0] * 3
    assert b["is_outlier"].tolist() == [False] * 3


def test_grouped_outliers_even_count_median(ray_session):
    from prompture_ray.stages.groupstats import grouped_outliers
    import numpy as np
    import pandas as pd
    # even group: median interpolates -> m2 = v[mid1] + v[mid2] exactly
    rng = np.random.default_rng(3)
    k = rng.integers(0, 7, 400)
    v = rng.integers(-1000, 1000, 400).astype("int64")
    ds = _ds({"k": pa.array(k, type=pa.int64()),
              "v": pa.array(v, type=pa.int64())}, parallelism=5)
    df = grouped_outliers(ds, "k", "v", k=2).to_pandas()
    pdf = pd.DataFrame({"k": k, "v": v})
    med = pdf.groupby("k")["v"].median()
    for key, grp in pdf.groupby("k"):
        m2_want = int(round(2 * med[key]))
        got = df[df["k"] == key]
        assert (got["m2"] == m2_want).all()
        d = (2 * grp["v"] - m2_want).abs()
        mad4_want = int(round(2 * d.median()))
        assert (got["mad4"] == mad4_want).all()
        dd = (2 * got["v"] - m2_want).abs()
        assert (got["is_outlier"] == (2 * dd > 2 * mad4_want)).all()


def test_gini_by_key_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    from prompture_ray.stages.groupstats import gini_by_key
    import ray.data as rd
    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n),
        "x": rng.integers(0, 500, n).astype("int64"),
    })
    out = gini_by_key(rd.from_pandas(df).repartition(9), "k", "x") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for r in out.itertuples(index=False):
        xs = np.sort(df[df["k"] == r.k]["x"].to_numpy())
        nn, tt = len(xs), int(xs.sum())
        s = int((np.arange(1, nn + 1, dtype=np.int64) * xs).sum())
        exp = (2 * s - (nn + 1) * tt) / (nn * tt)
        assert r.n == nn and r.total == tt
        assert r.gini == exp, (r.k, r.gini, exp)


def test_gini_zero_total_is_null(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from prompture_ray.stages.groupstats import gini_by_key
    df = pd.DataFrame({"k": ["a", "a", "b"], "x": [0, 0, 7]})
    out = gini_by_key(rd.from_pandas(df), "k", "x").to_pandas() \
        .set_index("k")
    assert np.isnan(out.loc["a", "gini"])
    assert out.loc["b", "gini"] == 0.0


def test_impute_group_median(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from prompture_ray.stages.groupstats import impute_group_median
    rng = np.random.default_rng(61)
    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 9, n),
        "v": rng.integers(0, 1000, n).astype("float"),
    })
    df.loc[df["id"] % 7 == 0, "v"] = np.nan
    # one all-null key
    df.loc[df["k"] == 8, "v"] = np.nan
    ds = rd.from_pandas(df.assign(
        v=df["v"].astype("Int64"))).repartition(7)
    out = impute_group_median(ds, "k", "v", out_col="v_imp") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    for kk in range(8):
        vals = df[(df["k"] == kk) & df["v"].notna()]["v"] \
            .to_numpy(dtype=np.int64)
        vs = np.sort(vals)
        med = int(vs[int(np.ceil(len(vs) / 2)) - 1])
        sel = out[out["k"] == kk]
        orig = df[df["k"] == kk].sort_values("id")
        missing = orig["v"].isna().to_numpy()
        got = sel["v_imp"].to_numpy()
        assert (got[missing] == med).all()
        assert (got[~missing] == orig["v"].dropna().to_numpy()).all()
    assert out[out["k"] == 8]["v_imp"].isna().all()
