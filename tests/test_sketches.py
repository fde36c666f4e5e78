"""Sketch correctness: accuracy bounds + merge == single-pass invariants."""

import numpy as np
import pytest

from prompture_ray.functions import sketches as sk


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(7)


def test_hash64_deterministic():
    a = np.array(["a", "b", "c"], dtype=object)
    assert np.array_equal(sk.hash64(a), sk.hash64(a))
    assert not np.array_equal(sk.hash64(a), sk.hash64(a, "other_key_000000"))


def test_hll_accuracy_and_merge(rng):
    n = 40000
    vals = np.array([f"u{i}" for i in range(n)], dtype=object)
    whole = sk.HLL(12)
    whole.update_array(vals)
    parts = [sk.HLL(12) for _ in range(8)]
    for i, p in enumerate(parts):
        p.update_array(vals[i::8])
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    # merge of disjoint partials must equal the single-pass sketch exactly
    assert np.array_equal(whole.registers, merged.registers)
    assert abs(whole.estimate() - n) / n < 0.05


def test_kll_quantiles_and_merge(rng):
    data = rng.lognormal(5, 1, 80000)
    whole = sk.KLL()
    whole.update_array(data)
    parts = [sk.KLL() for _ in range(4)]
    for i, p in enumerate(parts):
        p.update_array(data[i::4])
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    for q in (0.1, 0.5, 0.9):
        true = np.quantile(data, q)
        for est in (whole.quantile(q), merged.quantile(q)):
            assert abs(est - true) / true < 0.08, (q, est, true)
    assert merged.n == len(data)


def test_countmin_overestimates_only(rng):
    cm = sk.CountMin(depth=5, width=1024)
    vals = np.repeat(np.array([f"k{i}" for i in range(50)], dtype=object),
                     np.arange(1, 51) * 10)
    cm.update_array(vals)
    for i in (0, 25, 49):
        true = (i + 1) * 10
        est = cm.estimate(f"k{i}")
        assert est >= true
        assert est <= true + cm.total * 0.02


def test_topk_merge():
    t1, t2 = sk.TopK(3), sk.TopK(3)
    t1.update_array(np.array(["a"] * 10 + ["b"] * 5, dtype=object))
    t2.update_array(np.array(["a"] * 7 + ["c"] * 20, dtype=object))
    t1.merge(t2)
    assert t1.top() == [("c", 20), ("a", 17), ("b", 5)]


def test_bloom_no_false_negatives(rng):
    bl = sk.Bloom(1 << 18, 5)
    present = np.array([f"p{i}" for i in range(5000)], dtype=object)
    absent = np.array([f"a{i}" for i in range(5000)], dtype=object)
    bl.add_array(present)
    assert bl.contains_array(present).all()
    assert bl.contains_array(absent).mean() < 0.02


def test_bloom_merge():
    b1, b2 = sk.Bloom(1 << 14, 4), sk.Bloom(1 << 14, 4)
    b1.add_array(np.array(["x"], dtype=object))
    b2.add_array(np.array(["y"], dtype=object))
    b1.merge(b2)
    assert b1.contains_array(np.array(["x", "y"], dtype=object)).all()


def test_minhash_jaccard(rng):
    mh = sk.MinHasher(256)
    a = sk.hash64(np.array([f"t{i}" for i in range(200)], dtype=object))
    b = sk.hash64(np.array([f"t{i}" for i in range(100, 300)], dtype=object))
    est = (mh.sig(a) == mh.sig(b)).mean()
    true = 100 / 300
    assert abs(est - true) < 0.1


def test_simhash_similar_texts_close():
    base = [f"w{i}" for i in range(100)]
    near = base[:95] + [f"x{i}" for i in range(5)]
    far = [f"y{i}" for i in range(100)]
    h0 = sk.simhash64(sk.hash64(np.array(base, dtype=object)))
    h1 = sk.simhash64(sk.hash64(np.array(near, dtype=object)))
    h2 = sk.simhash64(sk.hash64(np.array(far, dtype=object)))
    d_near = sk.hamming_distance64(np.array([h0]), np.array([h1]))[0]
    d_far = sk.hamming_distance64(np.array([h0]), np.array([h2]))[0]
    assert d_near < d_far
    assert d_near <= 12


def test_hist_merge_and_drift():
    h1, h2 = sk.Hist.log_bins(), sk.Hist.log_bins()
    rng = np.random.RandomState(0)
    d = rng.lognormal(5, 1, 20000)
    h1.update_array(d[:10000])
    h2.update_array(d[10000:])
    h1.merge(h2)
    whole = sk.Hist.log_bins()
    whole.update_array(d)
    assert np.array_equal(h1.counts, whole.counts)
    # identical distributions → psi ~ 0; shifted → psi > 0.1
    shifted = sk.Hist.log_bins()
    shifted.update_array(rng.lognormal(5.5, 1, 20000))
    assert sk.psi(whole.probs(), whole.probs()) < 1e-9
    assert sk.psi(whole.probs(), shifted.probs()) > 0.1
    assert sk.ks_from_hist(whole.counts, shifted.counts) > 0.1


def test_grouped_drift_and_heavy_hitters(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from prompture_ray.stages.stats import (
        score_drift_by_group, detect_heavy_hitters)
    rng = np.random.RandomState(0)
    n = 6000
    groups = np.where(rng.random_sample(n) < 0.7, "en",
                      np.where(rng.random_sample(n) < 0.5, "de", "fr"))
    vals = np.where(groups == "fr",
                    rng.lognormal(6.5, 0.5, n),   # shifted segment
                    rng.lognormal(5.0, 0.5, n))
    ds = rd.from_arrow(pa.table({"lang": list(groups),
                                 "v": vals.astype(float)}))
    drift = score_drift_by_group(ds, "lang", "v")
    by = dict(zip(drift["group"], drift["psi"]))
    assert by["fr"] > by["en"]          # the shifted segment stands out
    assert by["fr"] > 0.5

    hot = detect_heavy_hitters(ds, "lang", sample_frac=0.5,
                               threshold_frac=0.2)
    assert "en" in hot and "fr" not in hot
