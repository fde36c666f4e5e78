"""Int8 embedding quantization (stages/quantize.py): code exactness,
round-trip error bound, zero-vector handling, layout invariance."""
import numpy as np
import pyarrow as pa

from prompture_ray.stages.quantize import (quantize_embeddings,
                                           dequantize_embeddings,
                                           quantization_stats)


def _ds(vecs):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([np.asarray(v, np.float32) for v in vecs],
                              type=pa.list_(pa.float32()))}))


def test_codes_exact(ray_session):
    vecs = [[1.0, -0.5, 0.25, 0.0], [0.0, 0.0, 0.0],
            [-2.0, 2.0], [0.1, 0.2, -0.3]]
    df = quantize_embeddings(_ds(vecs), "embedding", "vec_id") \
        .to_pandas().sort_values("id", ignore_index=True)
    # hand-checked: floor(x/scale*127 + 0.5)
    assert list(df["q"][0]) == [127, -63, 32, 0]
    assert list(df["q"][1]) == [0, 0, 0] and df["scale"][1] == 0.0
    assert list(df["q"][2]) == [-127, 127]
    s3 = np.float64(np.float32(-0.3).__abs__())
    exp3 = [int(np.floor(np.float64(np.float32(x)) / s3 * 127.0 + 0.5))
            for x in (0.1, 0.2, -0.3)]
    assert list(df["q"][3]) == exp3
    assert list(df["n_dims"]) == [4, 3, 2, 3]


def test_roundtrip_error_bound(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    qds = quantize_embeddings(_ds(list(vecs)), "embedding", "vec_id")
    back = dequantize_embeddings(qds).to_pandas() \
        .sort_values("id", ignore_index=True)
    for i, row in back.iterrows():
        x = vecs[i].astype(np.float64)
        xhat = np.asarray(list(row["embedding"]), np.float64)
        scale = np.abs(x).max()
        assert np.abs(x - xhat).max() <= scale / 254 + 1e-9
        assert abs(row["scale"] - scale) < 1e-12


def test_stats_match_codes(ray_session):
    vecs = [[0.5, -0.25, 1.0], [3.0, -3.0, 1.5, 0.0]]
    codes = quantize_embeddings(_ds(vecs), "embedding", "vec_id") \
        .to_pandas().sort_values("id", ignore_index=True)
    stats = quantization_stats(_ds(vecs), "embedding", "vec_id") \
        .to_pandas().sort_values("id", ignore_index=True)
    for i in range(len(vecs)):
        q = np.asarray(list(codes["q"][i]), np.int64)
        assert stats["q_sum"][i] == q.sum()
        assert stats["q_l1"][i] == np.abs(q).sum()
        assert stats["scale_micro"][i] == int(np.floor(
            codes["scale"][i] * 1e6))


def test_layout_invariance_real(ray_session):
    import ray.data as rd
    outs = []
    for nb in (1, 5):
        ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                             columns=["vec_id", "embedding"]) \
            .repartition(nb)
        outs.append(quantization_stats(ds, "embedding", "vec_id")
                    .to_pandas().sort_values("id", ignore_index=True))
    assert outs[0].equals(outs[1])
    assert (outs[0]["q_l1"] > 0).any()


def test_domain_mix_weights(ray_session):
    import ray.data as rd
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "b", "c"])}))
    from prompture_ray.stages.sampling import domain_mix_weights
    # uniform target: w_d = N/(K*n_d) = 6/(3*n_d)
    df = domain_mix_weights(ds, "source", "doc_id").to_pandas() \
        .sort_values("id", ignore_index=True)
    exp = {"a": 6 / 9, "b": 6 / 6, "c": 6 / 3}
    for _, r in df.iterrows():
        assert r["weight"] == exp[r["source"]]
    # custom rational targets: a→1/2, b→1/2, c absent → 0
    df2 = domain_mix_weights(ds, "source", "doc_id",
                             targets={"a": (1, 2), "b": (1, 2)}) \
        .to_pandas().sort_values("id", ignore_index=True)
    exp2 = {"a": (1 * 6) / (2 * 3), "b": (1 * 6) / (2 * 2), "c": 0.0}
    for _, r in df2.iterrows():
        assert r["weight"] == exp2[r["source"]]
