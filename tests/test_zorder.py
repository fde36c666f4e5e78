"""Z-order clustering (stages/zorder.py)."""

import numpy as np
import pandas as pd
import pytest


def test_morton_key_hand_values():
    from prompture_ray.stages.zorder import morton_key
    # x=0b11, y=0b01 -> z = x bits at 0,2 ; y bits at 1,3 -> 0b0111
    assert morton_key(np.array([3]), np.array([1]), bits=2).tolist() \
        == [0b0111]
    assert morton_key(np.array([0, 1, 0, 1]),
                      np.array([0, 0, 1, 1]), bits=1).tolist() \
        == [0, 1, 2, 3]


def test_morton_key_range_guard():
    from prompture_ray.stages.zorder import morton_key
    with pytest.raises(ValueError, match="2\\^4"):
        morton_key(np.array([16]), np.array([0]), bits=4)
    with pytest.raises(ValueError, match="2\\^4"):
        morton_key(np.array([0]), np.array([-1]), bits=4)


def test_zorder_sort_improves_2d_locality(ray_session):
    """After the z-sort, the per-block x/y bounding boxes cover far
    less area than row-order blocks — the pruning property the layout
    exists for."""
    import ray.data as rd
    from prompture_ray.stages.zorder import zorder_sort

    rng = np.random.default_rng(17)
    n = 4096
    df = pd.DataFrame({"x": rng.integers(0, 256, n),
                       "y": rng.integers(0, 256, n)})

    def area(frames):
        return sum((f["x"].max() - f["x"].min() + 1)
                   * (f["y"].max() - f["y"].min() + 1) for f in frames)

    ds = rd.from_pandas(df).repartition(16)
    plain = [b for b in ds.iter_batches(batch_format="pandas",
                                        batch_size=256)]
    z = zorder_sort(ds, "x", "y", bits=8)
    zb = [b for b in z.iter_batches(batch_format="pandas",
                                    batch_size=256)]
    assert area(zb) * 4 < area(plain)
    # sorted by zkey
    zk = z.to_pandas()["zkey"].to_numpy()
    assert (np.diff(zk) >= 0).all()
