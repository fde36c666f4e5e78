"""Exact set-similarity join vs brute force (stages/setjoin.py)."""

from fractions import Fraction

import numpy as np
import pandas as pd
import pytest


def _mk(df: pd.DataFrame):
    import ray.data as rd
    return rd.from_pandas(df).repartition(7)


def _brute(df, thr: Fraction):
    sets = {r.i: set(r.text.split()) for r in df.itertuples()}
    out = []
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            A, B = sets[a], sets[b]
            inter = len(A & B)
            union = len(A | B)
            if union and Fraction(inter, union) >= thr:
                out.append((a, b, inter, len(A), len(B),
                            inter / union))
    return sorted(out)


def _gen(n, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        g = i // 5
        base = g * 30
        k = rng.integers(6, 14)
        toks = {f"t{base + (i % 5) * 3 + j}" for j in range(k)}
        rows.append((i, " ".join(sorted(toks))))
    return pd.DataFrame(rows, columns=["i", "text"])


@pytest.mark.parametrize("thr", [Fraction(1, 2), Fraction(3, 10)])
def test_matches_bruteforce(ray_session, thr):
    from prompture_ray.stages.setjoin import set_similarity_join
    df = _gen(250, 5)
    out = set_similarity_join(_mk(df), "i", "text", thr) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    got = sorted(map(tuple, out.itertuples(index=False)))
    assert got == _brute(df, thr)


def test_no_df_broadcast_path_equal(ray_session):
    from prompture_ray.stages.setjoin import set_similarity_join
    df = _gen(120, 9)
    a = set_similarity_join(_mk(df), "i", "text", Fraction(1, 2)) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    b = set_similarity_join(_mk(df), "i", "text", Fraction(1, 2),
                            broadcast_max=0) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_id_range_guard(ray_session):
    from prompture_ray.stages.setjoin import set_similarity_join
    df = pd.DataFrame({"i": [2**31, 2**31 + 1],
                       "text": ["x y z", "x y z"]})
    with pytest.raises(ValueError, match="2\\^31"):
        set_similarity_join(_mk(df), "i", "text", 0.5).to_pandas()


def test_candidate_cap_guard(ray_session):
    from prompture_ray.stages.setjoin import set_similarity_join
    df = pd.DataFrame({"i": range(30),
                       "text": ["common token set"] * 30})
    with pytest.raises(ValueError, match="candidate_max"):
        set_similarity_join(_mk(df), "i", "text", 0.5,
                            candidate_max=10).to_pandas()


def _brute_containment(df, thr: Fraction):
    sets = {r.i: set(r.text.split()) for r in df.itertuples()}
    out = []
    for a in sets:
        for b in sets:
            if a == b:
                continue
            A, B = sets[a], sets[b]
            inter = len(A & B)
            if A and Fraction(inter, len(A)) >= thr:
                out.append((a, b, inter, len(A), len(B),
                            inter / len(A)))
    return sorted(out)


@pytest.mark.parametrize("thr", [Fraction(3, 4), Fraction(1, 2)])
def test_containment_matches_bruteforce(ray_session, thr):
    from prompture_ray.stages.setjoin import containment_join
    rng = np.random.default_rng(31)
    rows = []
    for i in range(180):
        g = i // 6
        base = g * 40
        k = int(rng.integers(4, 12))
        toks = {f"t{base + (i % 6) * 2 + j}" for j in range(k)}
        rows.append((i, " ".join(sorted(toks))))
    df = pd.DataFrame(rows, columns=["i", "text"])
    out = containment_join(_mk(df), "i", "text", thr) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    got = sorted(map(tuple, out.itertuples(index=False)))
    assert got == _brute_containment(df, thr)


def test_containment_subset_is_found(ray_session):
    from prompture_ray.stages.setjoin import containment_join
    df = pd.DataFrame({
        "i": [0, 1, 2],
        "text": ["x y", "x y z w q r", "a b c"],
    })
    out = containment_join(_mk(df), "i", "text", 1.0).to_pandas()
    assert list(map(tuple, out[["a", "b"]].itertuples(index=False))) \
        == [(0, 1)]
    assert out["containment"].tolist() == [1.0]
