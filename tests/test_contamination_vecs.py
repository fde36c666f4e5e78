"""Quantized-embedding cross-corpus contamination
(stages/quantize.py quantized_contamination_pairs): exact-copy hits,
integer threshold semantics vs a float brute-force reference,
zero-vector and empty-eval edges."""
import numpy as np
import pyarrow as pa

from prompture_ray.stages.quantize import (quantized_contamination_pairs,
                                           _quantize_flat)


def _ds(ids, vecs, id_col="vec_id"):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "embedding": pa.array([np.asarray(v, np.float32) for v in vecs],
                              type=pa.list_(pa.float32()))}))


def _qcodes(vecs):
    flat = np.concatenate([np.asarray(v, np.float32).astype(np.float64)
                           for v in vecs])
    offs = np.arange(0, (len(vecs) + 1) * len(vecs[0]), len(vecs[0]))
    q, _ = _quantize_flat(flat, offs.astype(np.int64))
    return q.astype(np.int64).reshape(len(vecs), -1)


def test_copies_and_threshold(ray_session):
    rng = np.random.default_rng(3)
    train = list(rng.normal(size=(40, 8)).astype(np.float32))
    # eval: two exact copies of train vectors + one orthogonal-ish
    evals = [train[5], train[17],
             np.eye(8, dtype=np.float32)[0]]
    pairs = quantized_contamination_pairs(
        _ds(range(40), train), _ds([900, 901, 902], evals),
        "embedding", "vec_id", tau_num=9, tau_den=10).to_pandas() \
        .sort_values(["eval_id", "train_id"], ignore_index=True)

    # exact copies quantize identically → cosine 1 ≥ 0.9, always hit
    assert ((pairs["train_id"] == 5) & (pairs["eval_id"] == 900)).any()
    assert ((pairs["train_id"] == 17) & (pairs["eval_id"] == 901)).any()

    # every reported pair satisfies the integer rule, and the engine
    # reports EXACTLY the pairs a float brute force over the quantized
    # codes finds (margin-free equivalence: the rule is integer-exact)
    qt, qe = _qcodes(train), _qcodes(evals)
    dots = qt @ qe.T
    na = (qt * qt).sum(1)
    nb = (qe * qe).sum(1)
    expect = {(int(t), 900 + int(e))
              for t, e in zip(*np.nonzero(
                  (dots > 0) &
                  (dots * dots * 100 >= 81 * na[:, None] * nb[None, :])))}
    got = set(zip(pairs["train_id"].astype(int),
                  pairs["eval_id"].astype(int)))
    assert got == expect
    # exact ints round-trip
    row = pairs[(pairs["train_id"] == 5) & (pairs["eval_id"] == 900)]
    assert int(row["dot"].iloc[0]) == int(na[5])
    assert int(row["na"].iloc[0]) == int(row["nb"].iloc[0]) == int(na[5])


def test_zero_vector_and_empty_eval(ray_session):
    train = [[0.0, 0.0], [1.0, 0.0]]
    evals = [[0.0, 0.0]]
    pairs = quantized_contamination_pairs(
        _ds([0, 1], train), _ds([9], evals), "embedding", "vec_id") \
        .to_pandas()
    assert len(pairs) == 0            # dot>0 excludes zero vectors

    empty_eval = _ds([0, 1], train).filter(lambda r: False)
    pairs2 = quantized_contamination_pairs(
        _ds([0, 1], train), empty_eval, "embedding", "vec_id") \
        .to_pandas()
    assert len(pairs2) == 0
