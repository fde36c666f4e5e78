"""Grouped integer-exact OLS (stages/regression.py): hand-checked
lines, brute-force moment equality, degenerate-key drop."""
import numpy as np
import pyarrow as pa

from prompture_ray.stages.regression import grouped_ols


def _ds(tbl: dict, parallelism: int = 3):
    import ray.data as rd
    return rd.from_arrow(pa.table(tbl)).repartition(parallelism)


def test_ols_hand_checked(ray_session):
    # key 1: exact line y = 3x + 2 -> slope 3, intercept 2
    # key 2: all x equal -> dropped
    ds = _ds({"k": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
              "x": pa.array([0, 1, 2, 7, 7], type=pa.int64()),
              "y": pa.array([2, 5, 8, 1, 9], type=pa.int64())})
    df = grouped_ols(ds, "k", "x", "y").to_pandas()
    assert list(df["k"]) == [1]
    assert df["slope"][0] == 3.0 and df["intercept"][0] == 2.0
    assert df["n"][0] == 3 and df["sxy"][0] == 0 * 2 + 1 * 5 + 2 * 8


def test_ols_brute(ray_session):
    rng = np.random.default_rng(13)
    n = 700
    k = rng.integers(0, 20, size=n)
    x = rng.integers(-100, 100, size=n)
    y = rng.integers(-100, 100, size=n)
    ds = _ds({"k": pa.array(k, type=pa.int64()),
              "x": pa.array(x, type=pa.int64()),
              "y": pa.array(y, type=pa.int64())}, parallelism=5)
    df = grouped_ols(ds, "k", "x", "y").to_pandas() \
        .sort_values("k", ignore_index=True)
    for r in df.itertuples():
        m = k == r.k
        xs, ys = x[m].astype(np.int64), y[m].astype(np.int64)
        nn = int(m.sum())
        sx, sy = int(xs.sum()), int(ys.sum())
        sxy, sxx = int((xs * ys).sum()), int((xs * xs).sum())
        assert (r.n, r.sx, r.sy, r.sxy, r.sxx) == (nn, sx, sy, sxy,
                                                   sxx)
        den = nn * sxx - sx * sx
        assert r.slope == (nn * sxy - sx * sy) / den
        assert r.intercept == (sy * sxx - sx * sxy) / den
    expect = set()
    for kk in np.unique(k):
        m = k == kk
        xs = x[m].astype(np.int64)
        if int(m.sum()) * int((xs * xs).sum()) \
                - int(xs.sum()) ** 2 != 0:
            expect.add(kk)
    assert set(df["k"]) == expect
