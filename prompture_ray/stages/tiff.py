"""TIFF codec — uncompressed baseline TIFF, pure Python/numpy.

Reference media surface: /root/reference/prompture/media/image.py
(.tiff MIME mapping only — the codec is beyond-reference).

Scope: 8-bit grayscale (photometric 1) and RGB(A) (photometric 2),
compression 1 (none), both byte orders (II/MM), multi-strip images,
BitsPerSample/StripOffsets arrays stored inline or offset. Encode emits
single-strip little-endian files — the lossless inverse, so planted
payloads round-trip exactly (the GIF/PNG oracle pattern). LZW/JPEG-in-
TIFF, tiled and 16-bit files are rejected with clear errors.
"""

from __future__ import annotations

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


def _read_entries(payload: bytes, bo: str):
    def u16(o):
        return int.from_bytes(payload[o:o + 2], bo)

    def u32(o):
        return int.from_bytes(payload[o:o + 4], bo)

    ifd = u32(4)
    n = u16(ifd)
    tags = {}
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag = u16(e)
        typ = u16(e + 2)
        cnt = u32(e + 4)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            data_off = e + 8
        else:
            data_off = u32(e + 8)
        step = _TYPE_SIZES.get(typ, 1)
        rd = u16 if typ == 3 else u32
        if typ in (3, 4):
            vals = [rd(data_off + j * step) for j in range(cnt)]
        elif typ == 1:
            vals = list(payload[data_off:data_off + cnt])
        else:
            vals = [u32(data_off)]
        tags[tag] = vals
    return tags


def decode_tiff(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Uncompressed TIFF → (w, h, channels, HxWxC uint8; gray = C 1,
    RGB(A) in storage order)."""
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")
    tags = _read_entries(payload, bo)
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from None
    comp = tags.get(259, [1])[0]
    if comp != 1:
        raise ValueError(
            f"unsupported TIFF compression {comp} (only 1 = none)")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (strips only)")
    nch = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits} (8 only)")
    photo = tags.get(262, [1])[0]
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    data = b"".join(payload[o:o + c] for o, c in zip(offsets, counts))
    need = w * h * nch
    if len(data) < need:
        raise ValueError("TIFF strip data shorter than image")
    px = np.frombuffer(data, dtype=np.uint8, count=need) \
        .reshape(h, w, nch)
    if photo == 0:                               # WhiteIsZero → invert
        px = 255 - px
    return w, h, nch, px


def encode_tiff(px: np.ndarray) -> bytes:
    """HxW (gray) or HxWxC uint8 → single-strip little-endian TIFF.
    Lossless inverse of ``decode_tiff``."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    photo = 1 if nch == 1 else 2
    data = np.ascontiguousarray(px).tobytes()

    entries = []                                  # (tag, type, count, value)
    extra = bytearray()
    header_len = 8
    # IFD layout: count(2) + n*12 + next(4), then extra data, then strip
    def add(tag, typ, cnt, vals):
        entries.append((tag, typ, cnt, vals))

    add(256, 3, 1, [w])
    add(257, 3, 1, [h])
    add(258, 3, nch, [8] * nch)
    add(259, 3, 1, [1])
    add(262, 3, 1, [photo])
    add(273, 4, 1, None)                          # patched below
    add(277, 3, 1, [nch])
    add(278, 3, 1, [h])
    add(279, 4, 1, [len(data)])
    n = len(entries)
    ifd_off = header_len
    extra_off = ifd_off + 2 + n * 12 + 4

    # place >4-byte payloads (only BitsPerSample when nch > 2)
    placed = {}
    for tag, typ, cnt, vals in entries:
        size = _TYPE_SIZES[typ] * cnt
        if vals is not None and size > 4:
            placed[tag] = extra_off + len(extra)
            for v in vals:
                extra += int(v).to_bytes(_TYPE_SIZES[typ], "little")
    strip_off = extra_off + len(extra)

    out = bytearray(b"II*\x00")
    out += ifd_off.to_bytes(4, "little")
    out += n.to_bytes(2, "little")
    for tag, typ, cnt, vals in entries:
        if tag == 273:
            vals = [strip_off]
        out += tag.to_bytes(2, "little") + typ.to_bytes(2, "little") \
            + cnt.to_bytes(4, "little")
        size = _TYPE_SIZES[typ] * cnt
        if size > 4:
            out += placed[tag].to_bytes(4, "little")
        else:
            field = bytearray(4)
            for j, v in enumerate(vals):
                field[j * _TYPE_SIZES[typ]:(j + 1) * _TYPE_SIZES[typ]] = \
                    int(v).to_bytes(_TYPE_SIZES[typ], "little")
            out += field
    out += (0).to_bytes(4, "little")              # no next IFD
    out += extra
    out += data
    return bytes(out)


def synth_tiff(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Solid-color RGB TIFF (lossless round-trip)."""
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = rgb
    return encode_tiff(px)
