"""GIF codec: lossless LZW round-trips (incl. width growth + table
reset), interlacing, transparency/disposal, dispatch integration."""

import numpy as np
import pytest

from prompture_ray.stages import gif as G
from prompture_ray.stages import multimodal as mm


def test_lossless_roundtrip_all_palette_widths():
    rng = np.random.RandomState(7)
    for npal, shape in [(2, (20, 31)), (4, (50, 60)), (16, (80, 90)),
                        (256, (120, 130))]:
        idx = rng.randint(0, npal, size=shape).astype(np.uint8)
        pal = rng.randint(0, 256, size=(npal, 3)).astype(np.uint8)
        w, h, frames = G.decode_gif(G.encode_gif(idx, pal))
        assert (w, h) == (shape[1], shape[0])
        assert (frames[0] == pal[idx]).all(), npal


def test_lzw_table_reset_path():
    # >4096 distinct-ish sequences force a mid-stream table reset
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 256, size=(200, 211)).astype(np.uint8)
    pal = np.arange(256 * 3, dtype=np.uint8).reshape(256, 3) % 256
    _, _, frames = G.decode_gif(G.encode_gif(idx, pal))
    assert (frames[0] == pal[idx]).all()


def test_interlaced_roundtrip():
    rng = np.random.RandomState(9)
    idx = rng.randint(0, 8, size=(23, 17)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
    payload = G.encode_gif(idx, pal, interlace=True)
    _, _, frames = G.decode_gif(payload)
    assert (frames[0] == pal[idx]).all()


def test_multiframe_and_synth():
    colors = [(10, 20, 30), (200, 100, 0), (1, 2, 3)]
    payload = G.synth_gif(9, 5, colors)
    w, h, frames = G.decode_gif(payload)
    assert (w, h, len(frames)) == (9, 5, 3)
    for f, c in zip(frames, colors):
        assert (f == np.array(c)).all()


def test_transparency_and_disposal_restore_bg():
    """Hand-built GIF: frame 1 full red; frame 2 a 1x1 overlay with the
    transparent index → canvas keeps red under the transparent pixel."""
    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    base = np.zeros((2, 2), dtype=np.uint8)            # all red
    payload = bytearray(G.encode_gif(base, pal))
    assert payload[-1] == 0x3B
    payload = payload[:-1]
    # GCE: transparency on, transparent index 1
    payload += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 1, 0])
    # 2x2 frame of transparent index
    overlay = np.ones((2, 2), dtype=np.uint8)
    payload += bytes([0x2C]) + b"\x00\x00\x00\x00" \
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little") \
        + bytes([0, 2]) + G._sub_blocks(G._lzw_encode(overlay.ravel(), 2))
    payload += bytes([0x3B])
    w, h, frames = G.decode_gif(bytes(payload))
    assert len(frames) == 2
    assert (frames[1] == np.array([255, 0, 0])).all()  # stays red


def test_decode_image_dispatch_gif():
    payload = G.synth_gif(7, 4, [(9, 8, 7)])
    w, h, c, px = mm.decode_image(payload)
    assert (w, h, c) == (7, 4, 3)
    assert (px[0, 0] == [9, 8, 7]).all()


def test_frame_sample_stage_real_gif(ray_session):
    import pyarrow as pa
    import ray.data as rd
    payload = G.synth_gif(4, 3, [(30, 30, 30), (60, 60, 60),
                                 (90, 90, 90), (120, 120, 120),
                                 (150, 150, 150)])
    t = pa.table({"media_id": pa.array(["g"]),
                  "payload": pa.array([payload], type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        mm.FrameSampleStage("payload", n_frames=4, decoder="real"),
        batch_format="pyarrow").to_pandas().sort_values("frame_idx")
    assert out["frame_idx"].tolist() == [0, 1, 2, 3]
    assert out["mean_intensity"].tolist() == [30.0, 60.0, 90.0, 120.0]


def test_bad_gif_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        G.decode_gif(b"NOPE")
    with pytest.raises(ValueError, match="power of two"):
        G.encode_gif(np.zeros((2, 2), dtype=np.uint8),
                     np.zeros((3, 3), dtype=np.uint8))
