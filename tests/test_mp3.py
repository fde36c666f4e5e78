"""MP3 frame-header metadata (stages/mp3.py)."""
import pyarrow as pa
import pytest

from prompture_ray.stages.mp3 import build_mp3, parse_mp3_meta, Mp3MetaStage


def test_roundtrip_cbr():
    blob = build_mp3(5, bitrate_idx=9, samplerate_idx=0)  # 128k/44100
    m = parse_mp3_meta(blob)
    assert m["n_frames"] == 5 and m["sample_rate"] == 44100
    assert m["bitrate_kbps"] == 128 and not m["vbr"]
    assert m["n_samples"] == 5 * 1152
    assert m["duration_us"] == 5 * 1152 * 1_000_000 // 44100
    # frame length sanity: 144*128000/44100 = 417 bytes
    assert len(blob) == 5 * 417


def test_id3_skip_and_vbr():
    a = build_mp3(2, bitrate_idx=9, samplerate_idx=1, id3=b"x" * 37)
    m = parse_mp3_meta(a)
    assert (m["n_frames"], m["sample_rate"]) == (2, 48000)
    # VBR: concatenate frames of two bitrates
    one = build_mp3(1, bitrate_idx=9)
    two = build_mp3(1, bitrate_idx=14)
    m2 = parse_mp3_meta(one + two)
    assert m2["vbr"] and m2["bitrate_kbps"] == -1 and m2["n_frames"] == 2


def test_errors():
    with pytest.raises(ValueError, match="sync"):
        parse_mp3_meta(b"\x00" * 32)
    with pytest.raises(ValueError, match="no frames"):
        parse_mp3_meta(b"")
    trunc = build_mp3(1)[:100]  # mid-frame truncation: lost sync on hop
    m = parse_mp3_meta(trunc)   # single partial frame still counted
    assert m["n_frames"] == 1


def test_stage_on_error_null(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "payload": pa.array([build_mp3(3), b"garbage"],
                            type=pa.binary())}))
    df = ds.map_batches(Mp3MetaStage(on_error="null"),
                        batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert df["n_frames"][0] == 3
    assert df["n_frames"].isna()[1]
    with pytest.raises(Exception):
        ds.map_batches(Mp3MetaStage(), batch_format="pyarrow").to_pandas()


def test_ogg_roundtrip():
    from prompture_ray.stages.mp3 import build_ogg, parse_ogg_meta
    blob = build_ogg(44100 * 3, sample_rate=44100, channels=2)
    m = parse_ogg_meta(blob)
    assert m == {"sample_rate": 44100, "channels": 2,
                 "n_samples": 132300, "duration_us": 3_000_000,
                 "n_pages": 2}
    m2 = parse_ogg_meta(build_ogg(48000 + 17, sample_rate=48000,
                                  channels=1))
    assert m2["duration_us"] == (48000 + 17) * 1_000_000 // 48000
    import pytest
    with pytest.raises(ValueError, match="sync"):
        parse_ogg_meta(b"not an ogg stream" * 3)
    with pytest.raises(ValueError, match="truncated"):
        parse_ogg_meta(build_ogg(100)[:-1])
