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
