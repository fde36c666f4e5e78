"""TIFF codec: lossless round-trips, gray/RGB/RGBA, format guards,
dispatch."""

import numpy as np
import pytest

from prompture_ray.stages import tiff as T
from prompture_ray.stages import multimodal as mm


def test_roundtrip_lossless_shapes():
    rng = np.random.RandomState(5)
    for shape in [(7, 9), (7, 9, 1), (6, 5, 3), (4, 4, 4)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        w, h, c, out = T.decode_tiff(T.encode_tiff(px))
        ref = px if px.ndim == 3 else px[:, :, None]
        assert (w, h, c) == (ref.shape[1], ref.shape[0], ref.shape[2])
        assert (out == ref).all(), shape


def test_decode_image_dispatch_tiff():
    p = T.synth_tiff(6, 3, (10, 11, 12))
    w, h, c, px = mm.decode_image(p)
    assert (w, h, c) == (6, 3, 3)
    assert (px[0, 0] == [10, 11, 12]).all()


def test_unsupported_rejected():
    with pytest.raises(ValueError, match="not a TIFF"):
        T.decode_tiff(b"XXXX")
    # LZW compression tag rejected: patch compression entry to 5
    p = bytearray(T.encode_tiff(np.zeros((2, 2), dtype=np.uint8)))
    # find the 259 entry and rewrite its value
    n = int.from_bytes(p[8:10], "little")
    for i in range(n):
        e = 10 + 12 * i
        if int.from_bytes(p[e:e + 2], "little") == 259:
            p[e + 8:e + 10] = (5).to_bytes(2, "little")
    with pytest.raises(ValueError, match="compression"):
        T.decode_tiff(bytes(p))
