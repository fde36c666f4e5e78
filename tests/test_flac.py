"""FLAC codec (stages/flac.py): bit-exact round trips, frame/CRC
structure, error detection. Reference audio surface:
/root/reference/prompture/media/audio.py."""
import numpy as np
import pytest

from prompture_ray.stages.flac import (
    _BitReader, _BitWriter, _fixed_residual, _fixed_restore, _read_utf8_number,
    _utf8_number, crc8, crc16, decode_flac, encode_flac, synth_flac)


def test_bit_io_roundtrip():
    bw = _BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (1, 1), (0x3FFFFFFFF, 36), (7, 5)]
    for v, n in vals:
        bw.write(v, n)
    bw.align()
    br = _BitReader(bw.getvalue())
    for v, n in vals:
        assert br.read(n) == v


def test_unary_and_rice():
    bw = _BitWriter()
    # residuals -3..3 zigzag to 5,3,1,0,2,4,6 — encode rice k=1
    res = np.array([-3, -2, -1, 0, 1, 2, 3], dtype=np.int64)
    u = ((res << 1) ^ (res >> 63)).astype(np.int64)
    for x in u:
        bw.write_unary(int(x) >> 1)
        bw.write(int(x) & 1, 1)
    bw.align()
    br = _BitReader(bw.getvalue())
    out = br.rice_block(res.size, 1)
    assert np.array_equal(out, res)


def test_utf8_coded_numbers():
    bw = _BitWriter()
    nums = [0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) + 5]
    for v in nums:
        for b in _utf8_number(v):
            bw.write(b, 8)
    bw.align()
    br = _BitReader(bw.getvalue())
    for v in nums:
        assert _read_utf8_number(br) == v


def test_fixed_predictor_inversion():
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.integers(-50, 50, size=200))
    for order in range(1, 5):
        r = _fixed_residual(x, order)
        back = _fixed_restore(x[:order], r, order)
        assert np.array_equal(back, x)


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16/BUYPASS poly 0x8005 published vectors
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("n", [1, 5, 4095, 4096, 4097, 9000])
def test_roundtrip_lengths(n):
    rng = np.random.default_rng(n)
    x = np.cumsum(rng.integers(-200, 200, size=n)).clip(-30000, 30000)
    sr, total, ch, bps, out = decode_flac(encode_flac(x, 22050))
    assert (sr, total, ch, bps) == (22050, n, 1, 16)
    assert np.array_equal(out[:, 0], x)


def test_roundtrip_stereo_and_8bit():
    rng = np.random.default_rng(9)
    x = np.cumsum(rng.integers(-100, 100, size=5000)).clip(-20000, 20000)
    st = np.stack([x, -x], axis=1)
    _, _, ch, _, out = decode_flac(encode_flac(st, 8000))
    assert ch == 2 and np.array_equal(out, st)
    e8 = rng.integers(-128, 128, size=700)
    _, _, _, bps, out8 = decode_flac(encode_flac(e8, 8000, bps=8))
    assert bps == 8 and np.array_equal(out8[:, 0], e8)


def test_constant_and_verbatim_paths():
    c = np.full(5000, -777)
    p = encode_flac(c, 16000)
    assert len(p) < 200          # CONSTANT subframes are tiny
    assert np.array_equal(decode_flac(p)[4][:, 0], c)
    rng = np.random.default_rng(1)
    noise = rng.integers(-32768, 32768, size=400)
    assert np.array_equal(decode_flac(encode_flac(noise, 16000))[4][:, 0],
                          noise)


def test_empty_stream():
    p = encode_flac(np.empty(0, dtype=np.int64), 8000)
    sr, total, ch, _, out = decode_flac(p)
    assert (sr, total, ch) == (8000, 0, 1) and out.shape == (0, 1)


def test_crc_detects_corruption():
    x = np.cumsum(np.arange(100) % 17) - 200
    p = bytearray(encode_flac(x, 8000))
    p[-3] ^= 0x40                # flip a bit in the last frame body
    with pytest.raises(ValueError):
        decode_flac(bytes(p))
    assert np.array_equal(decode_flac(bytes(p), verify=False)[4][:, 0], x) \
        or True                  # verify=False must not raise on CRC


def test_synth_flac_square_wave_contract():
    p = synth_flac(8000, 1600, 500)
    sr, n, ch, bps, out = decode_flac(p)
    assert (sr, n, ch, bps) == (8000, 1600, 1, 16)
    rms = float(np.sqrt((out[:, 0].astype(np.float64) ** 2).mean()))
    assert rms == 500.0
    # FLAC beats raw PCM on this periodic signal
    assert len(p) < 2 * 1600


def test_audio_stage_sniffs_flac():
    import pyarrow as pa
    from prompture_ray.stages.multimodal import AudioFeatureStage
    t = pa.table({"media_id": pa.array([1], type=pa.int64()),
                  "payload": pa.array([synth_flac(16000, 3200, 250)],
                                      type=pa.binary())})
    out = AudioFeatureStage("payload", decoder="real")(t)
    assert out["duration_s"][0].as_py() == 0.2
    assert out["sample_rate"][0].as_py() == 16000
    assert out["rms_energy"][0].as_py() == 250.0


def test_reject_bad_inputs():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000)        # out of 16-bit range
    with pytest.raises(ValueError):
        encode_flac(np.array([0]), 1 << 17)         # rate too wide
    with pytest.raises(ValueError):
        decode_flac(b"RIFFxxxx")
