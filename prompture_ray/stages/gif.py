"""GIF codec — pure Python/numpy LZW, no external libraries.

Reference media surface: /root/reference/prompture/media/image.py
(GIF87a/GIF89a magic detection only — the codec is beyond-reference).

Scope: GIF87a/GIF89a decode (global + local color tables, interlacing,
multi-frame animations composited with disposal methods 0/1/2,
transparency via the GCE transparent index) and GIF89a encode (single- or
multi-frame, global color table, uncompressed-free real LZW). GIF is
LOSSLESS over its palette, so planted payloads round-trip exactly —
every decoded pixel equals the planted palette color, giving closed-form
oracles with no rounding analysis at all (unlike JPEG).
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW stream → palette indices (length n_pixels)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader, LSB-first
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return out[:n_out]           # truncated stream: best effort
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out[:n_out]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Palette indices → GIF LZW stream (clear at start, EOI at end)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    prev = b""
    for b in indices.astype(np.uint8).tobytes():
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= (1 << 12):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap a byte stream in ≤255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_gif(payload: bytes):
    """GIF → (w, h, [HxWx3 uint8 RGB frames]). Frames are composited
    per the disposal methods (0/1 leave, 2 restore-to-background);
    transparent pixels keep the underlying canvas."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[bg_index % len(gct)]
    frames: list[np.ndarray] = []
    transparent = None
    disposal = 0

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                             # trailer
            break
        if b == 0x21:                             # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:                     # graphics control
                sz = payload[pos]
                flags = payload[pos + 1]
                disposal = (flags >> 2) & 0x7
                transparent = payload[pos + 4] if flags & 1 else None
                pos += sz + 1
            while payload[pos] != 0:              # skip (sub)blocks
                pos += payload[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left = int.from_bytes(payload[pos + 1:pos + 3], "little")
        top = int.from_bytes(payload[pos + 3:pos + 5], "little")
        fw = int.from_bytes(payload[pos + 5:pos + 7], "little")
        fh = int.from_bytes(payload[pos + 7:pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                  offset=pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame with no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), min_code, fw * fh)
        if len(idx) < fw * fh:                    # truncated: pad with bg
            idx = np.concatenate([idx, np.zeros(fw * fh - len(idx),
                                                dtype=np.uint8)])
        grid = np.empty((fh, fw), dtype=np.uint8)
        if ipacked & 0x40:                        # interlaced
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, fh, step))
            grid[np.asarray(rows, dtype=np.int64)] = \
                idx.reshape(fh, fw)
        else:
            grid = idx.reshape(fh, fw)
        prev_canvas = canvas.copy()
        region = canvas[top:top + fh, left:left + fw]
        colors = table[np.clip(grid, 0, len(table) - 1)]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = colors[mask]
        else:
            region[:] = colors
        frames.append(canvas.copy())
        if disposal == 2:                         # restore to background
            bg = table[bg_index % len(table)] if gct is not None else 0
            canvas[top:top + fh, left:left + fw] = bg
        elif disposal == 3:                       # restore to previous
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return w, h, frames


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_gif(frames, palette: np.ndarray, interlace: bool = False) -> bytes:
    """List of HxW uint8 palette-INDEX grids (+ shared palette Nx3 RGB,
    N a power of two ≥ 2) → GIF89a bytes. Lossless inverse of
    ``decode_gif`` for full-canvas frames. ``interlace=True`` stores
    rows in the 4-pass interlace order (exercises the decode path)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    if n < 2 or (n & (n - 1)):
        raise ValueError("palette size must be a power of two >= 2")
    bits = max(1, int(n).bit_length() - 1)
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += palette.tobytes()
    min_code = max(2, bits)
    for grid in frames:
        if grid.shape != (h, w):
            raise ValueError("all frames must share the canvas size")
        out += bytes([0x2C]) + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0])  # no LCT
        out += bytes([min_code])
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            grid = grid[np.asarray(rows, dtype=np.int64)]
        out += _sub_blocks(_lzw_encode(grid.ravel(), min_code))
    out += bytes([0x3B])
    return bytes(out)


def synth_gif(w: int, h: int, colors: list[tuple[int, int, int]]) -> bytes:
    """Multi-frame GIF of solid frames (one per color) over a shared
    palette — decodes losslessly to the planted colors."""
    pal = list(colors)
    n = 2
    while n < len(pal):
        n <<= 1
    pal = pal + [(0, 0, 0)] * (n - len(pal))
    frames = [np.full((h, w), i, dtype=np.uint8)
              for i in range(len(colors))]
    return encode_gif(frames, np.asarray(pal, dtype=np.uint8))
