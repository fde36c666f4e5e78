"""Baseline JPEG codec: closed-form solid-gray arithmetic, near-lossless
round-trips at quant=1, format guards, dispatch integration."""

import numpy as np
import pytest

from prompture_ray.stages import jpeg as J
from prompture_ray.stages import multimodal as mm


def test_solid_gray_closed_form_sweep():
    for v in range(0, 256, 7):
        for q in (1, 7, 16, 50, 255):
            payload = J.synth_jpeg_gray(13, 9, v, q)
            w, h, c, px = J.decode_jpeg(payload)
            assert (w, h, c) == (13, 9, 1)
            assert (px == J.jpeg_solid_gray_decoded_value(v, q)).all(), \
                (v, q)


def test_gray_roundtrip_near_lossless_q1():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 17)).astype(np.uint8)
    payload = J.encode_jpeg(img, quant=np.ones(64, dtype=np.int64))
    w, h, c, px = J.decode_jpeg(payload)
    assert (w, h, c) == (17, 24, 1)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_color_roundtrip_q1():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 19, 3)).astype(np.uint8)
    payload = J.encode_jpeg(img, quant=np.ones(64, dtype=np.int64))
    w, h, c, px = J.decode_jpeg(payload)
    assert (w, h, c) == (19, 16, 3)
    # YCbCr round-trip + DCT rounding bound
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 3


def test_non_multiple_of_8_crop_and_padding():
    img = np.tile(np.arange(100, 121, dtype=np.uint8), (5, 1))  # 5x21
    payload = J.encode_jpeg(img, quant=np.ones(64, dtype=np.int64))
    w, h, c, px = J.decode_jpeg(payload)
    assert (w, h) == (21, 5)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_unsupported_formats_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"\x00\x01")
    # lossless SOF3 marker stream (genuinely unsupported)
    bogus = (b"\xff\xd8\xff\xc3\x00\x0b" + bytes([8]) + b"\x00\x08\x00\x08"
             + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="SOF"):
        J.decode_jpeg(bogus + b"\xff\xd9")
    # progressive SOF2 with no scans: structural error, not a reject
    sof2 = (b"\xff\xd8\xff\xc2\x00\x0b" + bytes([8]) + b"\x00\x08\x00\x08"
            + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="missing"):
        J.decode_jpeg(sof2 + b"\xff\xd9")
    with pytest.raises(ValueError, match="quant"):
        J.encode_jpeg(np.zeros((8, 8), dtype=np.uint8),
                      quant=np.zeros(64, dtype=np.int64))


def test_decode_image_dispatch_jpeg():
    payload = J.synth_jpeg_gray(11, 6, 77, 16)
    w, h, c, px = mm.decode_image(payload)
    assert (w, h, c) == (11, 6, 1)
    img3 = np.full((8, 8, 3), 90, dtype=np.uint8)
    payload3 = J.encode_jpeg(img3, quant=np.ones(64, dtype=np.int64))
    w, h, c, px3 = mm.decode_image(payload3)
    assert (w, h, c) == (8, 8, 3)
    assert np.abs(px3.astype(int) - 90).max() <= 3


def test_image_decode_stage_real_jpeg(ray_session):
    import pyarrow as pa
    import ray.data as rd
    t = pa.table({
        "media_id": pa.array(["j1", "j2"]),
        "payload": pa.array([J.synth_jpeg_gray(16, 8, 200, 16),
                             J.synth_jpeg_gray(9, 9, 40, 16)],
                            type=pa.binary()),
    })
    out = rd.from_arrow(t).map_batches(
        mm.ImageDecodeStage("payload", decoder="real"),
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    assert out["width"].tolist() == [16, 9]
    assert out["height"].tolist() == [8, 9]


def test_resize_stage_real_jpeg(ray_session):
    import pyarrow as pa
    import ray.data as rd
    big = np.full((32, 48, 3), 120, dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array(["v"]),
        "payload": pa.array([J.encode_jpeg(big)], type=pa.binary()),
    })
    out = rd.from_arrow(t).map_batches(
        mm.ImageResizeStage("payload", max_w=16, max_h=16, decoder="real"),
        batch_format="pyarrow").to_pandas()
    assert out["width"].iloc[0] == 16
    assert out["height"].iloc[0] <= 16
    px = mm.decode_bmp(out["payload"].iloc[0])[3]
    assert np.abs(px.astype(int) - 120).max() <= 3


def test_420_subsampled_roundtrip():
    # solid color: constant chroma subsamples exactly
    img = np.full((20, 22, 3), [90, 140, 60], dtype=np.uint8)
    p = J.encode_jpeg(img, quant=np.ones(64, dtype=np.int64),
                      subsample="420")
    w, h, c, px = J.decode_jpeg(p)
    assert (w, h, c) == (22, 20, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 3
    # odd dimensions exercise MCU padding + chroma edge padding
    img2 = np.full((9, 11, 3), [10, 200, 100], dtype=np.uint8)
    p2 = J.encode_jpeg(img2, quant=np.ones(64, dtype=np.int64),
                       subsample="420")
    w, h, c, px2 = J.decode_jpeg(p2)
    assert (w, h) == (11, 9)
    assert np.abs(px2.astype(int) - img2.astype(int)).max() <= 3
    # smooth gradients: bounded by chroma-replication loss
    yy, xx = np.mgrid[0:32, 0:24]
    img3 = np.stack([(yy * 4) % 256, (xx * 5) % 256,
                     ((xx + yy) * 3) % 256], axis=-1).astype(np.uint8)
    p3 = J.encode_jpeg(img3, quant=np.ones(64, dtype=np.int64),
                       subsample="420")
    _, _, _, px3 = J.decode_jpeg(p3)
    assert np.abs(px3.astype(int) - img3.astype(int)).max() <= 8


def test_bad_subsample_arg():
    with pytest.raises(ValueError, match="subsample"):
        J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8),
                      subsample="411")


def test_422_subsampled_roundtrip():
    img = np.full((10, 13, 3), [55, 180, 220], dtype=np.uint8)
    p = J.encode_jpeg(img, quant=np.ones(64, dtype=np.int64),
                      subsample="422")
    w, h, c, px = J.decode_jpeg(p)
    assert (w, h, c) == (13, 10, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 3


def test_progressive_identical_to_baseline_decode():
    """Progressive encode (spectral selection + successive approximation)
    produces the SAME quantized coefficients as baseline, so its decode
    must be bit-identical to decoding the baseline encoding."""
    rng = np.random.RandomState(11)
    for shape, q, dc_al, ac_al in [((16, 16), 1, 1, 1), ((9, 13), 1, 1, 1),
                                   ((8, 8), 1, 0, 0), ((21, 10), 4, 2, 2),
                                   ((40, 33), 16, 1, 2)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        quant = np.full(64, q, dtype=np.int64)
        base = J.decode_jpeg(J.encode_jpeg(img, quant=quant))[3]
        prog = J.decode_jpeg(J.encode_jpeg_progressive(
            img, quant=quant, dc_al=dc_al, ac_al=ac_al))[3]
        assert (base == prog).all(), (shape, q, dc_al, ac_al)


def test_progressive_color_identical():
    rng = np.random.RandomState(13)
    img3 = rng.randint(0, 256, size=(16, 19, 3)).astype(np.uint8)
    quant = np.ones(64, dtype=np.int64)
    base = J.decode_jpeg(J.encode_jpeg(img3, quant=quant))[3]
    prog = J.decode_jpeg(J.encode_jpeg_progressive(img3, quant=quant))[3]
    assert (base == prog).all()


def test_progressive_q1_roundtrip_bounded():
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, size=(24, 17)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_progressive(
        img, quant=np.ones(64, dtype=np.int64)))[3]
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1
