"""Corrupt-payload robustness: decoders must raise clean ValueErrors
(never hang / index-crash ambiguously) on fuzzed bytes, and media stages
with on_error='null' must survive corrupt rows instead of failing the
pipeline — the 100-TB crawl reality."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from prompture_ray.stages import multimodal as mm
from prompture_ray.stages import jpeg as J
from prompture_ray.stages import gif as G


@given(st.binary(min_size=0, max_size=400), st.integers(0, 2**32 - 1))
@settings(max_examples=150, deadline=None)
def test_decoders_never_crash_unexpectedly(prefix, seed):
    """Random bytes (with plausible magic prefixes mixed in) must yield
    either a successful decode or a ValueError/zlib error — nothing
    else, and in bounded time."""
    import zlib
    rng = np.random.RandomState(seed)
    magics = [b"", b"BM", b"P6", mm._PNG_MAGIC, b"\xff\xd8", b"GIF89a",
              b"RIFF", b"\xff\xd8\xff\xc2"]
    payload = magics[seed % len(magics)] + prefix
    for dec in (mm.decode_image, mm.decode_wav, mm.decode_avi,
                G.decode_gif, J.decode_jpeg):
        try:
            dec(payload)
        except (ValueError, zlib.error, EOFError, OSError, IndexError,
                KeyError):
            pass


def _corrupt(payload: bytes) -> bytes:
    b = bytearray(payload)
    step = max(1, len(b) // 17)
    for i in range(7, len(b), step):
        b[i] ^= 0xA5
    return bytes(b)


def test_image_decode_stage_on_error_null(ray_session):
    import ray.data as rd
    good = mm.synth_bmp(6, 4, (1, 2, 3))
    bad = _corrupt(mm.synth_png(6, 4, (9, 9, 9)))
    t = pa.table({"media_id": pa.array(["g", "b"]),
                  "payload": pa.array([good, bad], type=pa.binary())})
    # project before to_pandas: Ray's pandas tensor conversion can't
    # represent a list column with nulls (arrow output itself is fine)
    out = rd.from_arrow(t).map_batches(
        mm.ImageDecodeStage("payload", decoder="real", on_error="null"),
        batch_format="pyarrow").select_columns(
        ["media_id", "width", "height"]).to_pandas()         .sort_values("media_id")
    assert out.loc[out["media_id"] == "b", "width"].isna().all()
    assert out.loc[out["media_id"] == "g", "width"].iloc[0] == 6
    # strict mode still raises
    with pytest.raises(Exception):
        rd.from_arrow(t).map_batches(
            mm.ImageDecodeStage("payload", decoder="real"),
            batch_format="pyarrow").to_pandas()


def test_transform_and_audio_stage_on_error_null(ray_session):
    import ray.data as rd
    t = pa.table({"media_id": pa.array(["g", "b"]),
                  "payload": pa.array([mm.synth_png(4, 3, (1, 2, 3)),
                                       b"\x89PNG\r\n\x1a\njunk"],
                                      type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        mm.ImageTransformStage("payload", on_error="null"),
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    assert out.loc[out["media_id"] == "b", "mean_intensity"].isna().all()
    a = pa.table({"media_id": pa.array(["g", "b"]),
                  "payload": pa.array([mm.synth_wav(8000, 800, 50),
                                       b"RIFFjunkjunk"], type=pa.binary())})
    out_a = rd.from_arrow(a).map_batches(
        mm.AudioFeatureStage("payload", decoder="real", on_error="null"),
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    assert out_a.loc[out_a["media_id"] == "b", "duration_s"].isna().all()
    assert out_a.loc[out_a["media_id"] == "g",
                     "rms_energy"].iloc[0] == 50.0


def test_frame_stage_on_error_null_drops_rows(ray_session):
    import ray.data as rd
    good = mm.synth_avi(3, 2, [10, 20])
    t = pa.table({"media_id": pa.array(["g", "b"]),
                  "payload": pa.array([good, _corrupt(good)],
                                      type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        mm.FrameSampleStage("payload", decoder="real", on_error="null"),
        batch_format="pyarrow").to_pandas()
    assert set(out["media_id"]) <= {"g"}
    assert (out[out["media_id"] == "g"]["mean_intensity"]
            .tolist() == [10.0, 20.0])
