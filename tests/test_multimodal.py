"""Multimodal plumbing: schema contract, actor-pool stages, stubbed decode."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from prompture_ray.stages import multimodal as mm


@pytest.fixture(scope="module")
def media(ray_session):
    import ray.data as rd
    return rd.from_arrow(mm.synth_media_table(30))


def test_image_decode_stage(media):
    imgs = media.filter(lambda r: r["kind"] == "image")
    out = imgs.map_batches(mm.ImageDecodeStage, batch_format="pyarrow",
                           batch_size=8, concurrency=2).to_pandas()
    assert len(out) == 10
    assert "payload" not in out.columns       # dropped early (wide binary)
    assert (out["width"] >= 64).all() and (out["height"] >= 64).all()
    assert all(len(f) == 16 for f in out["features"])
    # deterministic
    out2 = imgs.map_batches(mm.ImageDecodeStage, batch_format="pyarrow",
                            batch_size=8, concurrency=2).to_pandas()
    assert out.sort_values("media_id")["width"].tolist() == \
        out2.sort_values("media_id")["width"].tolist()


def test_audio_stage(media):
    auds = media.filter(lambda r: r["kind"] == "audio")
    out = auds.map_batches(mm.AudioFeatureStage, batch_format="pyarrow",
                           batch_size=8, concurrency=2).to_pandas()
    assert len(out) == 10
    assert set(out["sample_rate"]) <= {16000, 44100}
    assert (out["duration_s"] > 0).all()
    assert (out["rms_energy"] >= 0).all()


def test_frame_sampling(media):
    vids = media.filter(lambda r: r["kind"] == "video")
    frames = vids.map_batches(mm.FrameSampleStage("payload", 4),
                              batch_format="pyarrow", batch_size=8).to_pandas()
    # instance → task pool; class + concurrency → actor pool (both work)
    assert len(frames) == 40
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}
    assert all(isinstance(f, bytes) and len(f) <= 1024 for f in frames["frame"])


def test_real_decoder_raises():
    with pytest.raises(NotImplementedError):
        mm.ImageDecodeStage(decoder="pil")
    with pytest.raises(NotImplementedError):
        mm.AudioFeatureStage(decoder="librosa")


def test_image_resize_stage(ray_session):
    import ray.data as rd
    import pytest
    from prompture_ray.stages.multimodal import (
        ImageResizeStage, synth_media_table, _fake_dims)
    media = rd.from_arrow(synth_media_table(24))
    imgs = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")),
        batch_format="pyarrow")
    out = imgs.map_batches(ImageResizeStage, batch_format="pyarrow",
                           batch_size=8, concurrency=2).to_pandas()
    # box respected, aspect preserved (within integer truncation),
    # payload shrinks when downscaled
    assert (out["width"] <= 512).all() and (out["height"] <= 512).all()
    src = synth_media_table(24).to_pandas()
    src = src[src["kind"] == "image"].reset_index(drop=True)
    out = out.sort_values("media_id").reset_index(drop=True)
    for i in range(len(out)):
        w0, h0 = _fake_dims(src["payload"][i])
        scale = min(1.0, 512 / w0, 512 / h0)
        assert out["width"][i] == max(1, int(w0 * scale))
        if scale < 1.0:
            assert len(out["payload"][i]) < len(src["payload"][i])
        else:
            assert out["payload"][i] == src["payload"][i]
    with pytest.raises(NotImplementedError):
        ImageResizeStage(decoder="pil")


def test_wav_codec_roundtrip():
    p = mm.synth_wav(8000, 1600, 1000)
    sr, n, ch, samples = mm.decode_wav(p)
    assert (sr, n, ch) == (8000, 1600, 1)
    assert samples.size == 1600
    assert float(abs(samples).max()) == 1000.0
    import numpy as np
    assert float(np.sqrt(np.mean(samples ** 2))) == 1000.0   # square wave


def test_bmp_codec_roundtrip():
    p = mm.synth_bmp(17, 9, (10, 200, 30))          # odd width → row padding
    w, h, nch, px = mm.decode_bmp(p)
    assert (w, h, nch) == (17, 9, 3)
    assert px.shape == (9, 17, 3)
    assert tuple(px[0, 0]) == (30, 200, 10)          # BGR order
    # arbitrary-pixel encode/decode round trip
    import numpy as np
    rng = np.random.RandomState(7)
    src = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    w2, h2, _, px2 = mm.decode_bmp(mm.encode_bmp(src))
    assert (w2, h2) == (6, 5)
    assert np.array_equal(px2, src)


def test_ppm_codec():
    import numpy as np
    header = b"P6\n# a comment\n6 4\n255\n"
    pix = np.arange(6 * 4 * 3, dtype=np.uint8).tobytes()
    w, h, nch, px = mm.decode_ppm(header + pix)
    assert (w, h, nch) == (6, 4, 3)
    assert px.tobytes() == pix


def test_real_image_decode_stage(ray_session):
    import ray.data as rd
    rows = pa.table({
        "media_id": pa.array(["a", "b"]),
        "payload": pa.array([mm.synth_bmp(20, 12, (255, 0, 0)),
                             b"P6\n2 2\n255\n" + b"\x80" * 12],
                            type=pa.binary()),
    })
    out = rd.from_arrow(rows).map_batches(
        mm.ImageDecodeStage("payload", decoder="real"),
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    assert out["width"].tolist() == [20, 2]
    assert out["height"].tolist() == [12, 2]
    # solid red → channel-mean 85 → bin 5 has all the mass
    feats = out["features"].tolist()
    assert feats[0][85 >> 4] == 1.0
    assert feats[1][8] == 1.0                        # 0x80 → mean 128 → bin 8


def test_real_audio_stage(ray_session):
    import ray.data as rd
    rows = pa.table({
        "media_id": pa.array(["a", "b"]),
        "payload": pa.array([mm.synth_wav(8000, 800, 500),
                             mm.synth_wav(16000, 4800, 2000)],
                            type=pa.binary()),
    })
    out = rd.from_arrow(rows).map_batches(
        mm.AudioFeatureStage("payload", decoder="real"),
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    assert out["sample_rate"].tolist() == [8000, 16000]
    assert out["duration_s"].tolist() == [0.1, 0.3]
    assert out["rms_energy"].tolist() == [500.0, 2000.0]


def test_real_resize_stage(ray_session):
    import ray.data as rd
    rows = pa.table({
        "media_id": pa.array(["big", "small"]),
        "payload": pa.array([mm.synth_bmp(64, 32, (1, 2, 3)),
                             mm.synth_bmp(8, 4, (9, 8, 7))],
                            type=pa.binary()),
    })
    out = rd.from_arrow(rows).map_batches(
        mm.ImageResizeStage("payload", max_w=16, max_h=16, decoder="real"),
        batch_format="pyarrow").to_pandas().set_index("media_id")
    assert (out.loc["big", "width"], out.loc["big", "height"]) == (16, 8)
    assert (out.loc["small", "width"], out.loc["small", "height"]) == (8, 4)
    # resized payload is itself a decodable BMP with the new dims
    w, h, _, px = mm.decode_bmp(out.loc["big", "payload"])
    assert (w, h) == (16, 8)
    assert tuple(px[0, 0]) == (3, 2, 1)
    # small image untouched byte-for-byte
    assert out.loc["small", "payload"] == mm.synth_bmp(8, 4, (9, 8, 7))


def test_png_codec_roundtrip():
    import numpy as np
    rng = np.random.RandomState(3)
    for nch in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(7, 5, nch)).astype(np.uint8)
        payload = mm.encode_png(px)
        w, h, c, out = mm.decode_png(payload)
        assert (w, h, c) == (5, 7, nch)
        assert (out == px).all()
    # magic-dispatch integration
    w, h, c, out = mm.decode_image(mm.synth_png(9, 4, (10, 20, 30)))
    assert (w, h, c) == (9, 4, 3)
    assert (out[0, 0] == [10, 20, 30]).all()


def test_png_all_filter_types_decode():
    """Hand-built PNGs exercising filters 1 (sub), 2 (up), 3 (average),
    4 (paeth) must reconstruct the same pixels as filter 0."""
    import zlib
    import numpy as np
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(6, 4, 3)).astype(np.uint8)
    ref = mm.decode_png(mm.encode_png(px))[3]
    h, w, nch = px.shape
    stride = w * nch
    flat = px.reshape(h, stride).astype(np.int32)
    for f in (1, 2, 3, 4):
        scan = bytearray()
        for y in range(h):
            scan.append(f)
            prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(flat[y, x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if (x >= nch and y) else 0
                if f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa_ <= pb_ and pa_ <= pc_ else \
                        (b if pb_ <= pc_ else c)
                scan.append((int(flat[y, x]) - pred) & 0xFF)
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, 2, 0, 0, 0]))
        payload = (mm._PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr)
                   + mm._png_chunk(b"IDAT", zlib.compress(bytes(scan)))
                   + mm._png_chunk(b"IEND", b""))
        out = mm.decode_png(payload)[3]
        assert (out == ref).all(), f"filter {f}"


def test_pixel_ops_exact():
    import numpy as np
    px = np.array([[[0, 100, 255]]], dtype=np.uint8)
    neg = mm._apply_pixel_ops(px, [("negative",)])
    assert neg.ravel().tolist() == [255, 155, 0]
    bright = mm._apply_pixel_ops(px, [("brightness", 30)])
    assert bright.ravel().tolist() == [30, 130, 255]
    contr = mm._apply_pixel_ops(px, [("contrast", 3, 2)])
    # (v-128)*3//2+128 clipped: 0->-64->0 ; 100->86 ; 255->318->255
    assert contr.ravel().tolist() == [0, 86, 255]


def test_image_transform_stage_roundtrip(ray_session):
    import numpy as np
    import ray.data as rd
    t = pa.table({
        "media_id": pa.array(["a", "b", "c"]),
        "payload": pa.array([
            mm.synth_png(4, 3, (10, 20, 30)),
            mm.synth_bmp(5, 2, (200, 100, 50)),
            mm.encode_ppm(np.full((2, 2, 3), 60, dtype=np.uint8)),
        ], type=pa.binary()),
    })
    out = rd.from_arrow(t).map_batches(
        mm.ImageTransformStage("payload", ops=[("negative",)]),
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    # containers preserved + pixels inverted
    pays = out["payload"].tolist()
    assert pays[0][:8] == mm._PNG_MAGIC
    assert pays[1][:2] == b"BM"
    assert pays[2][:2] == b"P6"
    px = mm.decode_png(pays[0])[3]
    assert (px[0, 0] == [245, 235, 225]).all()
    assert abs(out["mean_intensity"].iloc[0] - (245 + 235 + 225) / 3) < 1e-9
    # BGR bmp of (200,100,50) RGB -> stored BGR(50,100,200); negative
    px_b = mm.decode_bmp(pays[1])[3]
    assert (px_b[0, 0] == [205, 155, 55]).all()


def test_avi_codec_roundtrip():
    import numpy as np
    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, size=(6, 7, 3)).astype(np.uint8)
              for _ in range(5)]
    payload = mm.build_avi(frames, fps=12)
    w, h, fps, out = mm.decode_avi(payload)
    assert (w, h, fps, len(out)) == (7, 6, 12, 5)
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_frame_sample_stage_real(ray_session):
    import ray.data as rd
    t = pa.table({
        "media_id": pa.array(["v0"]),
        "payload": pa.array([mm.synth_avi(4, 3, [10, 20, 30, 40, 50, 60],
                                          fps=10)], type=pa.binary()),
    })
    out = rd.from_arrow(t).map_batches(
        mm.FrameSampleStage("payload", n_frames=3, decoder="real"),
        batch_format="pyarrow").to_pandas().sort_values("frame_idx")
    assert out["frame_idx"].tolist() == [0, 2, 4]
    assert out["mean_intensity"].tolist() == [10.0, 30.0, 50.0]
    assert out["width"].tolist() == [4, 4, 4]


def test_wav_24bit_pcm():
    import io
    import wave
    import numpy as np
    vals = np.array([0, 1000, -1000, (1 << 23) - 1, -(1 << 23)],
                    dtype=np.int32)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(16000)
        w.writeframes(raw)
    sr, n, ch, samples = mm.decode_wav(buf.getvalue())
    assert (sr, n, ch) == (16000, 5, 1)
    assert samples.astype(np.int64).tolist() == vals.tolist()


def test_wav_float32():
    import numpy as np
    vals = np.array([0.0, 0.5, -0.25, 1.0], dtype=np.float32)
    data = vals.tobytes()
    fmt = ((3).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little")
           + (8000 * 4).to_bytes(4, "little")
           + (4).to_bytes(2, "little") + (32).to_bytes(2, "little"))
    payload = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(data))
               .to_bytes(4, "little") + b"WAVE"
               + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
               + b"data" + len(data).to_bytes(4, "little") + data)
    sr, n, ch, samples = mm.decode_wav(payload)
    assert (sr, n, ch) == (8000, 4, 1)
    assert np.allclose(samples, vals)


def test_g711_expansion_matches_stdlib():
    """μ-law and A-law expansion must match audioop's reference tables
    for every byte value."""
    import warnings
    import numpy as np
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    all_bytes = np.arange(256, dtype=np.uint8)
    ref_mu = np.frombuffer(audioop.ulaw2lin(all_bytes.tobytes(), 2),
                           dtype="<i2").astype(np.float64)
    assert (mm._mulaw_expand(all_bytes) == ref_mu).all()
    ref_a = np.frombuffer(audioop.alaw2lin(all_bytes.tobytes(), 2),
                          dtype="<i2").astype(np.float64)
    assert (mm._alaw_expand(all_bytes) == ref_a).all()


def test_wav_mulaw_payload():
    import numpy as np
    data = bytes(range(0, 256, 16))
    fmt = ((7).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    payload = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(data))
               .to_bytes(4, "little") + b"WAVE"
               + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
               + b"data" + len(data).to_bytes(4, "little") + data)
    sr, n, ch, samples = mm.decode_wav(payload)
    assert (sr, n, ch) == (8000, 16, 1)
    assert samples[0] == mm._mulaw_expand(np.array([0], np.uint8))[0]
