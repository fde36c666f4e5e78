"""MPEG audio (MP3) frame-header metadata — stdlib-only frame walk
(reference surface: prompture/media/audio.py metadata extraction; full
PCM decode needs librosa, absent from this environment — this module
covers everything metadata-level: frame count, bitrate, sample rate,
duration, VBR detection, ID3v2 skip).

Wire format (public MPEG spec): each frame starts with a 32-bit header
``11111111 111VVLLP BBBBSSAA ...`` — 11 sync bits, version (2), layer
(2), CRC-protection (1), bitrate index (4), sample-rate index (2),
padding (1). MPEG1 Layer III frame length = 144·bitrate/samplerate
(+1 padding byte), 1152 samples per frame (576 for MPEG2/2.5).
``build_mp3`` synthesizes valid zero-payload frames — the planted
round-trip inverse, same pattern as the WAV/BMP/PDF builders.

Scale shape: runs inside map_batches over binary columns; the walk is
per-blob sequential (headers chain by design) but touches only 4 bytes
per frame hop — metadata extraction, not decode.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

# MPEG1 Layer III bitrate table (kbps), index 1..14
_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320]
_SAMPLERATES = [44100, 48000, 32000]       # MPEG1, index 0..2


def build_mp3(n_frames: int, bitrate_idx: int = 9,
              samplerate_idx: int = 0, id3: bytes | None = None) -> bytes:
    """Valid MPEG1 Layer III stream of ``n_frames`` zero-payload
    frames (optionally prefixed by an ID3v2 tag with payload ``id3``)."""
    if not 1 <= bitrate_idx <= 14:
        raise ValueError("bitrate_idx must be 1..14")
    if not 0 <= samplerate_idx <= 2:
        raise ValueError("samplerate_idx must be 0..2")
    out = bytearray()
    if id3 is not None:
        n = len(id3)
        size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F])
        out += b"ID3\x03\x00\x00" + size + id3
    br = _BITRATES[bitrate_idx] * 1000
    sr = _SAMPLERATES[samplerate_idx]
    flen = 144 * br // sr                  # no padding bit set
    # FF FB: sync + MPEG1 + Layer III + no CRC
    hdr = bytes([0xFF, 0xFB,
                 (bitrate_idx << 4) | (samplerate_idx << 2), 0x00])
    frame = hdr + b"\x00" * (flen - 4)
    for _ in range(n_frames):
        out += frame
    return bytes(out)


def parse_mp3_meta(blob: bytes) -> dict:
    """Frame-walk metadata: ``n_frames, sample_rate, bitrate_kbps``
    (-1 when VBR), ``n_samples, duration_us`` (integer floor),
    ``vbr``. Raises ValueError on anything that is not an MPEG1/2
    Layer III stream."""
    pos, n = 0, len(blob)
    if blob[:3] == b"ID3" and n >= 10:
        size = ((blob[6] & 0x7F) << 21) | ((blob[7] & 0x7F) << 14) \
            | ((blob[8] & 0x7F) << 7) | (blob[9] & 0x7F)
        pos = 10 + size
    n_frames = 0
    rates: set[int] = set()
    sr_out = spf = None
    while pos + 4 <= n:
        if blob[pos] != 0xFF or (blob[pos + 1] & 0xE0) != 0xE0:
            raise ValueError(f"mp3: lost sync at byte {pos}")
        version = (blob[pos + 1] >> 3) & 0x3   # 3=MPEG1, 2=MPEG2
        layer = (blob[pos + 1] >> 1) & 0x3     # 1=Layer III
        if layer != 1 or version not in (2, 3):
            raise ValueError("mp3: only MPEG1/2 Layer III supported")
        bidx = blob[pos + 2] >> 4
        sidx = (blob[pos + 2] >> 2) & 0x3
        pad = (blob[pos + 2] >> 1) & 0x1
        if bidx in (0, 15) or sidx == 3:
            raise ValueError("mp3: free-form/invalid bitrate or rate")
        mpeg1 = version == 3
        br = _BITRATES[bidx] * 1000 if mpeg1 else \
            [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160][bidx] * 1000
        sr = _SAMPLERATES[sidx] if mpeg1 else \
            [22050, 24000, 16000][sidx]
        coef = 144 if mpeg1 else 72
        flen = coef * br // sr + pad
        if flen < 4:
            raise ValueError("mp3: degenerate frame")
        sr_out, spf = sr, 1152 if mpeg1 else 576
        rates.add(br)
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("mp3: no frames")
    vbr = len(rates) > 1
    n_samples = n_frames * spf
    return {"n_frames": n_frames, "sample_rate": sr_out,
            "bitrate_kbps": -1 if vbr else next(iter(rates)) // 1000,
            "n_samples": n_samples,
            "duration_us": n_samples * 1_000_000 // sr_out,
            "vbr": vbr}


class Mp3MetaStage:
    """map_batches callable: binary column → metadata columns.
    ``on_error='null'`` nulls out unparseable payloads (crawl
    robustness, same contract as the image stages)."""

    def __init__(self, col: str = "payload", on_error: str = "raise"):
        self.col = col
        self.on_error = on_error

    def __call__(self, t: pa.Table) -> pa.Table:
        metas = []
        for b in t[self.col].to_pylist():
            try:
                metas.append(parse_mp3_meta(b))
            except (ValueError, TypeError, IndexError):
                if self.on_error != "null":
                    raise
                metas.append(None)
        def col(name, typ):
            return pa.array([None if m is None else m[name]
                             for m in metas], type=typ)
        return t.drop_columns([self.col]) \
            .append_column("n_frames", col("n_frames", pa.int64())) \
            .append_column("sample_rate", col("sample_rate", pa.int64())) \
            .append_column("bitrate_kbps", col("bitrate_kbps", pa.int64())) \
            .append_column("duration_us", col("duration_us", pa.int64())) \
            .append_column("vbr", col("vbr", pa.bool_()))


# ---------------------------------------------------------------------------
# Ogg/Vorbis metadata (same metadata-level coverage for the other
# ubiquitous web audio container; PCM decode is env-blocked like MP3)
# ---------------------------------------------------------------------------


def build_ogg(n_samples: int, sample_rate: int = 44100,
              channels: int = 2) -> bytes:
    """Minimal valid Ogg-Vorbis stream: page 0 carries the Vorbis
    identification header, a final page carries granule = n_samples
    (the duration convention). CRCs are zeroed (parsers that skip
    verification — like ours — accept it; documented)."""
    import struct

    def page(granule: int, seq: int, header_type: int,
             payload: bytes) -> bytes:
        segs = []
        rest = len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        head = b"OggS" + bytes([0, header_type]) \
            + struct.pack("<q", granule) \
            + struct.pack("<I", 0xFEED) + struct.pack("<I", seq) \
            + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs)
        return head + payload

    ident = b"\x01vorbis" + struct.pack("<I", 0) \
        + bytes([channels]) + struct.pack("<I", sample_rate) \
        + b"\x00" * 12 + b"\xb8\x01"
    return page(0, 0, 0x02, ident) + page(n_samples, 1, 0x04, b"")


def parse_ogg_meta(blob: bytes) -> dict:
    """Page-walk metadata: ``sample_rate, channels, n_samples``
    (last-page granule), ``duration_us`` (integer floor), ``n_pages``."""
    import struct
    pos, n = 0, len(blob)
    sr = ch = None
    last_granule = 0
    n_pages = 0
    while pos + 27 <= n:
        if blob[pos:pos + 4] != b"OggS":
            raise ValueError(f"ogg: lost page sync at byte {pos}")
        (granule,) = struct.unpack_from("<q", blob, pos + 6)
        nseg = blob[pos + 26]
        segs = blob[pos + 27:pos + 27 + nseg]
        if len(segs) != nseg:
            raise ValueError("ogg: truncated lacing table")
        body_len = sum(segs)
        body = blob[pos + 27 + nseg:pos + 27 + nseg + body_len]
        if len(body) != body_len:
            raise ValueError("ogg: truncated page body")
        if sr is None and body[:7] == b"\x01vorbis":
            ch = body[11]
            (sr,) = struct.unpack_from("<I", body, 12)
        if granule >= 0:
            last_granule = max(last_granule, granule)
        n_pages += 1
        pos += 27 + nseg + body_len
    if n_pages == 0 or sr is None:
        raise ValueError("ogg: no vorbis identification header")
    return {"sample_rate": sr, "channels": ch,
            "n_samples": last_granule,
            "duration_us": last_granule * 1_000_000 // sr,
            "n_pages": n_pages}
