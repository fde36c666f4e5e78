"""DSIR importance resampling (stages/dsir.py): brute-force equality,
dedup-first N-invariance, bigram features, Gumbel resampling, and the
non-circular derivation of the planted dsir_select_docs oracle."""
import math

import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.functions.sketches import hash64
from prompture_ray.stages.dsir import (
    _bucket_ids, dsir_fit, dsir_resample, dsir_score)


def _tok(s):
    return s.split()


def _brute_model(target_texts, raw_texts, B, alpha, bigrams):
    def counts(texts):
        vec = np.zeros(B, dtype=np.int64)
        for s in texts:
            toks = _tok(s)
            h = hash64(np.array(toks, dtype=object)) if toks else []
            for x in h:
                vec[int(x) % B] += 1
            if bigrams:
                for a, b in zip(h[:-1], h[1:]):
                    mix = (int(a) * 0x9E3779B97F4A7C15) ^ int(b)
                    vec[mix % (1 << 64) % B] += 1
        return vec
    ct, cr = counts(target_texts), counts(raw_texts)
    return (np.log((ct + alpha) / (ct.sum() + alpha * B))
            - np.log((cr + alpha) / (cr.sum() + alpha * B)))


def test_score_matches_brute_force(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(5)
    vocab = [f"w{j}" for j in range(30)]
    raw = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
           for _ in range(40)]
    target = [" ".join(rng.choice(vocab[:10], size=rng.integers(1, 8)))
              for _ in range(10)]
    B, alpha = 512, 0.5
    t_ds = rd.from_arrow(pa.table({"text": target}))
    r_ds = rd.from_arrow(pa.table(
        {"id": list(range(len(raw))), "text": raw}))
    model = dsir_fit(t_ds, r_ds, "text", n_buckets=B, bigrams=True,
                     alpha=alpha, dedup_first=False)
    lam = _brute_model(target, raw, B, alpha, bigrams=True)
    assert np.allclose(model["lam"], lam, atol=0, rtol=1e-15)

    out = dsir_score(r_ds, model, "text", "id").to_pandas() \
        .sort_values("id", ignore_index=True)
    for i, s in enumerate(raw):
        toks = _tok(s)
        h = hash64(np.array(toks, dtype=object))
        w = sum(lam[int(x) % B] for x in h)
        for a, b in zip(h[:-1], h[1:]):
            mix = (int(a) * 0x9E3779B97F4A7C15) ^ int(b)
            w += lam[mix % (1 << 64) % B]
        assert out["log_weight"][i] == pytest.approx(w, rel=1e-12)
        assert out["n_tokens"][i] == len(toks)


def test_dedup_first_makes_model_copy_invariant(ray_session):
    import ray.data as rd
    raw = ["a b", "a b", "a b", "c d e"]        # heavy exact dup
    target = ["a b c"]
    t_ds = rd.from_arrow(pa.table({"text": target}))
    m_dup = dsir_fit(t_ds, rd.from_arrow(pa.table({"text": raw})),
                     "text", n_buckets=128, bigrams=False,
                     dedup_first=True)
    m_uni = dsir_fit(t_ds, rd.from_arrow(pa.table({"text": raw[2:]})),
                     "text", n_buckets=128, bigrams=False,
                     dedup_first=True)
    assert np.array_equal(m_dup["lam"], m_uni["lam"])
    assert m_dup["raw_total"] == 5              # a b + c d e


def test_bucket_ids_bigrams_respect_doc_boundaries():
    lens = np.array([2, 3], dtype=np.int64)
    flat = np.array(["a", "b", "c", "d", "e"], dtype=object)
    ids, doc_of = _bucket_ids(lens, flat, 1 << 20, bigrams=True)
    # 5 unigrams + bigrams (a,b) (c,d) (d,e) — NOT (b,c) across docs
    assert len(ids) == 5 + 3
    assert doc_of.tolist() == [0, 0, 1, 1, 1, 0, 1, 1]


def test_resample_deterministic_topk(ray_session):
    import ray.data as rd
    t = pa.table({"id": list(range(20)),
                  "log_weight": [float(i % 7) for i in range(20)]})
    ds = rd.from_arrow(t)
    plain = dsir_resample(ds, 5, "id", gumbel=False).to_pandas()
    assert plain["resample_key"].tolist() == [6.0, 6.0, 5.0, 5.0, 5.0]
    assert plain["id"].tolist() == [6, 13, 5, 12, 19]  # ties by id
    g1 = dsir_resample(ds, 5, "id", gumbel=True).to_pandas()
    g2 = dsir_resample(ds, 5, "id", gumbel=True).to_pandas()
    assert g1["id"].tolist() == g2["id"].tolist()     # deterministic


def test_planted_oracle_derivation_noncircular():
    """Recompute the dsir_select_docs rule from the planted design with
    no engine code: dedup'd raw corpus = 12 residue texts (T_j: 6 each;
    R0/R1/R2: 4/8/12; total 42), dedup'd target = 3 texts (T_j: 3,
    R_j: 1; total 12). Assert the selected-set literal {3,6,9} and a
    sign margin far above float noise, plus collision-free buckets."""
    B, alpha = 4096, 0.001
    lam_t = [math.log((3 + alpha) / (12 + alpha * B))
             - math.log((6 + alpha) / (42 + alpha * B))] * 3
    cr_R = [4, 8, 12]
    lam_r = [math.log((1 + alpha) / (12 + alpha * B))
             - math.log((cr_R[j] + alpha) / (42 + alpha * B))
             for j in range(3)]
    sel, margin = [], 1e9
    for r in range(12):
        nt, j, nr = r % 4, r % 3, 1 + r % 3
        w = nt * lam_t[j] + nr * lam_r[j]
        margin = min(margin, abs(w))
        if w > 0:
            sel.append(r)
    assert sel == [3, 6, 9]
    assert margin > 1e-3                       # 0.0258 — noise-immune
    words = np.array(["T0", "T1", "T2", "R0", "R1", "R2"], dtype=object)
    assert len(set((hash64(words) % B).tolist())) == 6


def test_planted_query_engine_agrees(ray_session):
    """Engine output on a 120-doc contiguous-id table matches the
    derived rule exactly (the same check the SQL oracle encodes)."""
    import ray.data as rd
    from prompture_ray.stages.dsir import dsir_fit, dsir_score
    ids = list(range(120))
    raw = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": [" ".join([f"T{i % 3}"] * (i % 4)
                                      + [f"R{i % 3}"] * (1 + i % 3))
                             for i in ids]})
    tgt_ids = [i for i in ids if i % 10 == 0]
    tgt = pa.table({"text": [f"T{i % 3} T{i % 3} T{(i + 1) % 3} R{i % 3}"
                             for i in tgt_ids]})
    model = dsir_fit(rd.from_arrow(tgt), rd.from_arrow(raw), "text",
                     n_buckets=4096, bigrams=False, alpha=0.001,
                     dedup_first=True)
    out = dsir_score(rd.from_arrow(raw), model, "text", "doc_id",
                     threshold=0.0).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["selected"].tolist() == [i % 12 in (3, 6, 9) for i in ids]
    assert out["n_tokens"].tolist() == [(i % 4) + 1 + (i % 3)
                                        for i in ids]
