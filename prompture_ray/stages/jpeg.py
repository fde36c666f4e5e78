"""Baseline JPEG codec — pure numpy + stdlib, no Pillow.

Reference media surface: /root/reference/prompture/media/image.py
(MIME/base64 envelope only — the pixel codec itself is beyond-reference,
per the build brief's multimodal-column requirement).

Scope (documented subset, enough for training-pipeline JPEG columns):

- decode: baseline DCT (SOF0) AND progressive (SOF2 — spectral
  selection + successive approximation, incl. the AC correction-bit
  refinement algorithm), 8-bit precision, grayscale or 3-component
  YCbCr with sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), canonical
  DHT Huffman tables (any valid tables, not just Annex K), byte
  stuffing, DRI/RSTn restart markers. 12-bit, hierarchical and
  arithmetic coding are rejected with a clear error.
- encode: the matching inverses — ``encode_jpeg`` (baseline, 4:4:4 /
  4:2:2 / 4:2:0 or grayscale) and ``encode_jpeg_progressive``
  (DC+AC successive-approximation scan script) with per-image FLAT
  canonical Huffman tables (all used symbols at one code length; always
  a valid prefix code and never the all-ones 16-bit code), quality via
  caller-supplied quantization tables.

Exactness contract for planted oracles: every lossy rounding step uses
floor(x + 0.5) (round-half-up), so a solid-gray image round-trips to the
closed form ``clip(floor((QDC*q + 1028) / 8), 0, 255)`` with
``QDC = floor(8*(v-128)/q + 0.5)`` — reproducible in SQL with floor()
(media_jpeg_dims query). An all-ones quantization table is near-lossless
(max |error| ≤ 1 per sample from DCT float rounding), which the tests
use to pin the transform pipeline end to end.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II matrix: S = C @ B @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)

# a reasonable default luminance quant table (flat-ish, mid quality);
# callers planting oracles pass their own
DEFAULT_QUANT = np.full(64, 16, dtype=np.int64)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def _snap(x: np.ndarray) -> np.ndarray:
    """Snap float DCT/IDCT outputs to the nearest 1/256: the true values
    are rationals with a small power-of-two denominator, so this removes
    the ~1e-13 matrix-multiply noise that would otherwise flip
    floor(x+0.5) at exact half-integer boundaries (making the planted
    closed-form oracle deterministic)."""
    return np.round(x * 256.0) / 256.0


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:                       # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)     # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.hit_marker = False

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            self.hit_marker = True
            self.acc = (self.acc << 8) | 0
            self.nbits += 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:                     # stuffed byte
                self.pos += 2
            else:                               # a real marker ends the scan
                self.hit_marker = True
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, length: int) -> int:
        while self.nbits < length:
            self._fill()
        v = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self) -> None:
        """Consume a RSTn marker at the current byte position."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
                d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], symbols: list[int]) -> dict:
    """DHT (counts-per-length, symbol list) → {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _flat_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """All used symbols at ONE canonical code length — the shortest L
    with 2^L > n (strict, so the all-ones code is never assigned)."""
    syms = sorted(symbols) if symbols else [0]
    n = len(syms)
    L = 1
    while (1 << L) <= n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    return bits, syms


def _decode_lut(bits: list[int], symbols: list[int]):
    """Canonical table → per-length (min_code, max_code, first_index)
    for the standard sequential decode loop."""
    spans = []
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        spans.append((code, code + n - 1, k) if n else None)
        code = (code + n) << 1
        k += n
    return spans, symbols


def _read_symbol(r: _BitReader, table) -> int:
    spans, symbols = table
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read(1)
        span = spans[length - 1]
        if span is not None and span[0] <= code <= span[1]:
            return symbols[span[2] + (code - span[0])]
    raise ValueError("invalid JPEG Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category, extra bits) per JPEG F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# ---------------------------------------------------------------------------
# color transforms (floor(x+0.5) everywhere, per the exactness contract)
# ---------------------------------------------------------------------------

def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """8-pad (edge-replicate) and split into (n_blocks, 8, 8)."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    blocks = padded.reshape(H // 8, 8, W // 8, 8).swapaxes(1, 2) \
        .reshape(-1, 8, 8)
    return blocks, H // 8, W // 8


def _encode_plane_coeffs(plane: np.ndarray, quant: np.ndarray,
                         grid_h: int, grid_w: int) -> np.ndarray:
    """plane → (grid_h*grid_w, 64) zigzagged quantized coefficients,
    edge-padded to the MCU-aligned (grid_h*8, grid_w*8) raster."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, grid_h * 8 - h), (0, grid_w * 8 - w)),
                    mode="edge")
    blocks = padded.reshape(grid_h, 8, grid_w, 8).swapaxes(1, 2) \
        .reshape(-1, 8, 8)
    shifted = blocks.astype(np.float64) - 128.0
    coeffs = _snap(np.einsum("ux,nxy,vy->nuv", _C, shifted, _C))
    # quant arrives in zigzag order (like DQT); map to natural order
    qnat = np.empty(64, dtype=np.int64)
    qnat[ZIGZAG] = quant
    quantized = _round_half_up(coeffs / qnat.reshape(8, 8)).astype(np.int64)
    return quantized.reshape(-1, 64)[:, ZIGZAG]


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 mean downsample (edge-padded to even dims), floor(x+0.5)."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge") \
        .astype(np.float64)
    m = (padded[0::2, 0::2] + padded[0::2, 1::2]
         + padded[1::2, 0::2] + padded[1::2, 1::2]) / 4.0
    return np.clip(_round_half_up(m), 0, 255).astype(np.uint8)


def _downsample_h(plane: np.ndarray) -> np.ndarray:
    """Horizontal 1×2 mean downsample (4:2:2 chroma), floor(x+0.5)."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, 0), (0, w % 2)), mode="edge") \
        .astype(np.float64)
    m = (padded[:, 0::2] + padded[:, 1::2]) / 2.0
    return np.clip(_round_half_up(m), 0, 255).astype(np.uint8)


def _entropy_symbols(zz: np.ndarray, prev_dc: int):
    """One block's zigzag coeffs → (dc_sym, dc_bits), [(ac_sym, bits)]."""
    dc_diff = int(zz[0]) - prev_dc
    s, bits = _magnitude(dc_diff)
    ac = []
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.append((0xF0, 0, 0))             # ZRL
            run -= 16
        sz, vb = _magnitude(v)
        ac.append(((run << 4) | sz, vb, sz))
        run = 0
    if last < 63:
        ac.append((0x00, 0, 0))                 # EOB
    return (s, bits), ac, int(zz[0])


def encode_jpeg(px: np.ndarray, quant=None, subsample: str = "444") -> bytes:
    """HxW uint8 grayscale or HxWx3 uint8 RGB → baseline JFIF bytes.
    ``quant``: 64 zigzag-order quantization values (1..255), shared by
    every component (keeps the planted-oracle arithmetic one-table).
    ``subsample``: "444" (default), "420" (2×2-mean chroma — the layout
    virtually every web JPEG uses) or "422" (horizontal-only)."""
    quant = np.asarray(quant if quant is not None else DEFAULT_QUANT,
                       dtype=np.int64)
    if quant.shape != (64,) or quant.min() < 1 or quant.max() > 255:
        raise ValueError("quant must be 64 zigzag values in 1..255")
    if subsample not in ("444", "420", "422"):
        raise ValueError("subsample must be '444', '420' or '422'")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [(px, 1, 1)]
    else:
        ycc = rgb_to_ycbcr(px)
        if subsample == "420":
            planes = [(ycc[..., 0], 2, 2),
                      (_downsample2(ycc[..., 1]), 1, 1),
                      (_downsample2(ycc[..., 2]), 1, 1)]
        elif subsample == "422":
            planes = [(ycc[..., 0], 2, 1),
                      (_downsample_h(ycc[..., 1]), 1, 1),
                      (_downsample_h(ycc[..., 2]), 1, 1)]
        else:
            planes = [(ycc[..., 0], 1, 1), (ycc[..., 1], 1, 1),
                      (ycc[..., 2], 1, 1)]
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mw = (w + 8 * hmax - 1) // (8 * hmax)
    mh = (h + 8 * vmax - 1) // (8 * vmax)
    grids = [(mh * vi, mw * hi) for _p, hi, vi in planes]
    coeff = [_encode_plane_coeffs(p, quant, gh, gw)
             for (p, _hi, _vi), (gh, gw) in zip(planes, grids)]

    # first pass: collect used symbols per table class (flat tables),
    # emitting blocks in interleaved MCU order (vi×hi blocks per comp)
    dc_syms, ac_syms = set(), set()
    streams = []
    prev = [0] * len(planes)
    for my in range(mh):
        for mx in range(mw):
            for ci, (_p, hi, vi) in enumerate(planes):
                gw = grids[ci][1]
                for v_ in range(vi):
                    for u in range(hi):
                        b = (my * vi + v_) * gw + (mx * hi + u)
                        (s, bits), ac, dc_now = _entropy_symbols(
                            coeff[ci][b], prev[ci])
                        prev[ci] = dc_now
                        dc_syms.add(s)
                        ac_syms.update(sym for sym, _, _ in ac)
                        streams.append((ci, (s, bits), ac))
    dc_bits, dc_list = _flat_table(dc_syms)
    ac_bits, ac_list = _flat_table(ac_syms)
    dc_codes = _canonical_codes(dc_bits, dc_list)
    ac_codes = _canonical_codes(ac_bits, ac_list)

    wtr = _BitWriter()
    for _ci, (s, bits), ac in streams:
        code, ln = dc_codes[s]
        wtr.write(code, ln)
        wtr.write(bits, s)
        for sym, vb, sz in ac:
            code, ln = ac_codes[sym]
            wtr.write(code, ln)
            wtr.write(vb, sz)
    scan = wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    out = bytearray(b"\xff\xd8")                              # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in quant))
    ncomp = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for cid, (_p, hi, vi) in enumerate(planes, start=1):
        sof += bytes([cid, (hi << 4) | vi, 0])  # sampling, quant table 0
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits)
               + bytes(dc_list))                # DC table 0
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits)
               + bytes(ac_list))                # AC table 0
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])               # DC 0 / AC 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _find_scan_end(payload: bytes, pos: int) -> int:
    """First non-stuffing, non-RST marker after ``pos`` (end of one
    scan's entropy data)."""
    i = pos
    while i + 1 < len(payload):
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return i
        i += 1
    return len(payload)


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline (SOF0) or progressive (SOF2) JPEG →
    (w, h, channels, HxWxC uint8; RGB for color, C=1 for grayscale)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}     # (class, id) → decode LUT
    comps = None
    h = w = 0
    restart_interval = 0
    scan_comps = None
    progressive = False
    scans: list[dict] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        data = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(data[p + 1:p + 65],
                                          dtype=np.uint8).astype(np.int64)
                p += 65
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) JPEG are "
                f"supported (got SOF marker 0x{marker:02X})")
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            if data[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(data[1:3], "big")
            w = int.from_bytes(data[3:5], "big")
            nc = data[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, samp, tq = data[6 + 3 * i:9 + 3 * i]
                hi, vi = samp >> 4, samp & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported sampling factors {hi}x{vi} "
                        "(1-2 each supported: 4:4:4, 4:2:2, 4:2:0)")
                comps.append({"id": cid, "tq": tq, "hi": hi, "vi": vi})
        elif marker == 0xC4:
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = list(data[p + 1:p + 17])
                n = sum(bits)
                syms = list(data[p + 17:p + 17 + n])
                huff[(tc, th)] = _decode_lut(bits, syms)
                p += 17 + n
        elif marker == 0xDD:
            restart_interval = int.from_bytes(data[:2], "big")
        elif marker == 0xDA:
            ns = data[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = data[1 + 2 * i], data[2 + 2 * i]
                scan_comps.append({"cs": cs, "dc": tt >> 4, "ac": tt & 0xF})
            if not progressive:
                pos = pos + 2 + ln
                break
            ss, se, a = data[1 + 2 * ns:4 + 2 * ns]
            start = pos + 2 + ln
            end = _find_scan_end(payload, start)
            scans.append({"comps": scan_comps, "ss": ss, "se": se,
                          "ah": a >> 4, "al": a & 0xF, "start": start,
                          "dri": restart_interval,
                          "huff": dict(huff)})
            pos = end
            continue
        pos += 2 + ln
    if comps is None or (scan_comps is None and not scans):
        raise ValueError("JPEG missing SOF/SOS")
    if progressive:
        return _decode_progressive(payload, comps, quant, scans, w, h)

    nc = len(comps)
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mw = (w + 8 * hmax - 1) // (8 * hmax)
    mh = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mh * c["vi"] * 8, mw * c["hi"] * 8),
                       dtype=np.uint8) for c in comps]
    rdr = _BitReader(payload, pos)
    prev = [0] * nc
    qnat = []
    for c in comps:
        qz = quant[c["tq"]]
        qn = np.empty(64, dtype=np.int64)
        qn[ZIGZAG] = qz
        qnat.append(qn.reshape(8, 8))

    def read_block(ci: int) -> np.ndarray:
        sc = scan_comps[ci]
        zz = np.zeros(64, dtype=np.int64)
        s = _read_symbol(rdr, huff[(0, sc["dc"])])
        diff = _extend(rdr.read(s), s) if s else 0
        prev[ci] += diff
        zz[0] = prev[ci]
        k = 1
        while k < 64:
            sym = _read_symbol(rdr, huff[(1, sc["ac"])])
            if sym == 0x00:                     # EOB
                break
            run, sz = sym >> 4, sym & 0xF
            if sz == 0:
                if run != 15:
                    raise ValueError("bad AC symbol")
                k += 16                         # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC run overflows block")
            zz[k] = _extend(rdr.read(sz), sz)
            k += 1
        coeff = np.zeros(64, dtype=np.float64)
        coeff[ZIGZAG] = zz
        block = _snap(_C.T @ (coeff.reshape(8, 8) * qnat[ci]) @ _C)
        return np.clip(_round_half_up(block + 128.0), 0, 255) \
            .astype(np.uint8)

    mcu = 0
    for my in range(mh):
        for mx in range(mw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rdr.align_restart()
                prev = [0] * nc
            mcu += 1
            for ci, c in enumerate(comps):
                for v_ in range(c["vi"]):
                    for u in range(c["hi"]):
                        by, bx = my * c["vi"] + v_, mx * c["hi"] + u
                        planes[ci][by * 8:(by + 1) * 8,
                                   bx * 8:(bx + 1) * 8] = read_block(ci)

    return _assemble_planes(planes, comps, hmax, vmax, w, h)


def _assemble_planes(planes, comps, hmax, vmax, w, h):
    """Shared decode tail: replicate-upsample subsampled planes, crop to
    (h, w), color-convert."""
    full = []
    for p, c in zip(planes, comps):
        fy, fx = vmax // c["vi"], hmax // c["hi"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return w, h, 1, full[0][:, :, None]
    ycc = np.stack(full, axis=-1)
    return w, h, 3, ycbcr_to_rgb(ycc)


def _decode_progressive(payload: bytes, comps, quant, scans, w, h):
    """Progressive (SOF2) decode: accumulate per-block coefficients over
    the scans (spectral selection + successive approximation, incl. the
    AC refinement correction-bit algorithm), then dequantize + IDCT."""
    nc = len(comps)
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mw = (w + 8 * hmax - 1) // (8 * hmax)
    mh = (h + 8 * vmax - 1) // (8 * vmax)
    # coefficient store per comp: (grid_h*grid_w, 64) zigzag order
    grid = [(mh * c["vi"], mw * c["hi"]) for c in comps]
    coef = [np.zeros((gh * gw, 64), dtype=np.int32) for gh, gw in grid]
    cid_to_ci = {c["id"]: i for i, c in enumerate(comps)}

    for scan in scans:
        huff = scan["huff"]
        ss, se = scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        dri = scan["dri"]
        rdr = _BitReader(payload, scan["start"])
        sel = [(cid_to_ci[sc["cs"]], sc) for sc in scan["comps"]]
        if ss == 0:
            # ---- DC scan (interleaved MCU order; refinement = 1 bit) --
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            prev = [0] * nc
            interleaved = len(sel) > 1
            if interleaved:
                units = mh * mw
            else:
                ci0 = sel[0][0]
                c0 = comps[ci0]
                bwc = (-(-(w * c0["hi"]) // hmax) + 7) // 8
                bhc = (-(-(h * c0["vi"]) // vmax) + 7) // 8
                units = bhc * bwc
            for unit in range(units):
                if dri and unit and unit % dri == 0:
                    rdr.align_restart()
                    prev = [0] * nc
                if interleaved:
                    my, mx = divmod(unit, mw)
                    targets = []
                    for ci, sc in sel:
                        c = comps[ci]
                        for v_ in range(c["vi"]):
                            for u in range(c["hi"]):
                                idx = (my * c["vi"] + v_) * grid[ci][1] \
                                    + (mx * c["hi"] + u)
                                targets.append((ci, sc, idx))
                else:
                    ci, sc = sel[0]
                    by, bx = divmod(unit, bwc)
                    targets = [(ci, sc, by * grid[ci][1] + bx)]
                for ci, sc, idx in targets:
                    if ah == 0:
                        s = _read_symbol(rdr, huff[(0, sc["dc"])])
                        diff = _extend(rdr.read(s), s) if s else 0
                        prev[ci] += diff
                        coef[ci][idx, 0] = prev[ci] << al
                    else:
                        if rdr.read(1):
                            coef[ci][idx, 0] |= (1 << al)
            continue
        # ---- AC scan: single component, non-interleaved ---------------
        if len(sel) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, sc = sel[0]
        c = comps[ci]
        table = huff[(1, sc["ac"])]
        bwc = (-(-(w * c["hi"]) // hmax) + 7) // 8
        bhc = (-(-(h * c["vi"]) // vmax) + 7) // 8
        gw = grid[ci][1]
        eobrun = 0
        p1 = 1 << al
        for unit in range(bhc * bwc):
            if dri and unit and unit % dri == 0:
                rdr.align_restart()
                eobrun = 0
            by, bx = divmod(unit, bwc)
            blk = coef[ci][by * gw + bx]
            if ah == 0:
                # first AC scan for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _read_symbol(rdr, table)
                    r, s = sym >> 4, sym & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16              # ZRL
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rdr.read(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run overflows band")
                    blk[k] = _extend(rdr.read(s), s) << al
                    k += 1
            else:
                # refinement scan (libjpeg decode_mcu_AC_refine logic)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _read_symbol(rdr, table)
                        r, s = sym >> 4, sym & 0xF
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += rdr.read(r)
                                break
                            val = 0              # ZRL: 16 zero-history
                        else:
                            if s != 1:
                                raise ValueError(
                                    "bad refinement AC symbol")
                            val = p1 if rdr.read(1) else -p1
                        while k <= se:
                            cv = blk[k]
                            if cv:
                                if rdr.read(1) and (cv & p1) == 0:
                                    blk[k] = cv + (p1 if cv > 0 else -p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if k <= se and val:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        cv = blk[k]
                        if cv and rdr.read(1) and (cv & p1) == 0:
                            blk[k] = cv + (p1 if cv > 0 else -p1)
                        k += 1
                    eobrun -= 1

    # reconstruct planes from accumulated coefficients
    planes = []
    for ci, c in enumerate(comps):
        gh, gw = grid[ci]
        qz = quant[c["tq"]]
        qn = np.empty(64, dtype=np.int64)
        qn[ZIGZAG] = qz
        coeffs = np.zeros((gh * gw, 64), dtype=np.float64)
        coeffs[:, ZIGZAG] = coef[ci]
        deq = coeffs.reshape(-1, 8, 8) * qn.reshape(8, 8)
        blocks = _snap(np.einsum("xu,nuv,yv->nxy", _C.T, deq, _C.T))
        samples = np.clip(_round_half_up(blocks + 128.0), 0, 255) \
            .astype(np.uint8)
        plane = samples.reshape(gh, gw, 8, 8).swapaxes(1, 2) \
            .reshape(gh * 8, gw * 8)
        planes.append(plane)
    return _assemble_planes(planes, comps, hmax, vmax, w, h)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def encode_jpeg_progressive(px: np.ndarray, quant=None, dc_al: int = 1,
                            ac_al: int = 1) -> bytes:
    """Progressive (SOF2) encoder — grayscale or 4:4:4 RGB — with a
    spectral-selection + successive-approximation scan script:

    1. DC first scan, all components interleaved, Al=dc_al
    2. one-bit DC refinement scans down to Al=0
    3. per component: AC first scan (Ss=1..63, Al=ac_al)
    4. per component: AC refinement scans down to Al=0 (the T.81
       G.1.2.3 correction-bit algorithm, span-accurate bit flushing)

    Exercises every decode path of ``_decode_progressive``; round-trips
    are pinned against the baseline encoder's decode in tests."""
    quant = np.asarray(quant if quant is not None else DEFAULT_QUANT,
                       dtype=np.int64)
    if quant.shape != (64,) or quant.min() < 1 or quant.max() > 255:
        raise ValueError("quant must be 64 zigzag values in 1..255")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
    else:
        ycc = rgb_to_ycbcr(px)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    gh, gw = (h + 7) // 8, (w + 7) // 8
    coeff = [_encode_plane_coeffs(p, quant, gh, gw) for p in planes]
    nc = len(planes)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in quant))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC2, sof)

    def sos_header(comp_ids, tbl, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, (tbl << 4) | tbl])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    def emit_scan(symbol_stream, comp_ids, ss, se, ah, al,
                  tc: int | None):
        """symbol_stream: list of ('sym', s) / ('bits', value, n).
        Builds the flat DHT (if any symbols) + SOS + entropy bytes."""
        syms = {ev[1] for ev in symbol_stream if ev[0] == "sym"}
        if syms:
            bits_l, sym_l = _flat_table(syms)
            codes = _canonical_codes(bits_l, sym_l)
            out.extend(_seg(0xC4, bytes([(tc << 4) | 0]) + bytes(bits_l)
                            + bytes(sym_l)))
        out.extend(sos_header(comp_ids, 0, ss, se, ah, al))
        wtr = _BitWriter()
        for ev in symbol_stream:
            if ev[0] == "sym":
                code, ln = codes[ev[1]]
                wtr.write(code, ln)
            else:
                wtr.write(ev[1], ev[2])
        out.extend(wtr.flush())

    # ---- scan 1: DC first, interleaved, Al=dc_al ----------------------
    stream = []
    prev = [0] * nc
    for b in range(gh * gw):
        for ci in range(nc):
            v = int(coeff[ci][b][0]) >> dc_al
            diff = v - prev[ci]
            prev[ci] = v
            s, bits = _magnitude(diff)
            stream.append(("sym", s))
            if s:
                stream.append(("bits", bits, s))
    emit_scan(stream, list(range(1, nc + 1)), 0, 0, 0, dc_al, tc=0)

    # ---- DC refinement scans (1 bit/block) ----------------------------
    for al in range(dc_al - 1, -1, -1):
        stream = []
        for b in range(gh * gw):
            for ci in range(nc):
                stream.append(("bits", (int(coeff[ci][b][0]) >> al) & 1, 1))
        emit_scan(stream, list(range(1, nc + 1)), 0, 0, al + 1, al, tc=0)

    # ---- AC scans per component ---------------------------------------
    for ci in range(nc):
        # first scan at Al=ac_al (sign-magnitude point transform)
        stream = []
        for b in range(gh * gw):
            zz = coeff[ci][b]
            t = [(abs(int(zz[k])) >> ac_al) * (1 if zz[k] >= 0 else -1)
                 for k in range(1, 64)]
            run = 0
            nz = [i for i, v in enumerate(t) if v]
            last = nz[-1] + 1 if nz else 0
            for i in range(last):
                v = t[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    stream.append(("sym", 0xF0))
                    run -= 16
                s, bits = _magnitude(v)
                stream.append(("sym", (run << 4) | s))
                stream.append(("bits", bits, s))
                run = 0
            if last < 63:
                stream.append(("sym", 0x00))
        emit_scan(stream, [ci + 1], 1, 63, 0, ac_al, tc=1)

        # refinement scans down to Al=0
        for al in range(ac_al - 1, -1, -1):
            ah = al + 1
            stream = []
            for b in range(gh * gw):
                zz = coeff[ci][b]
                # classify band positions 1..63
                kinds = []                  # (kind, payload) per position
                for k in range(1, 64):
                    v = int(zz[k])
                    t = abs(v) >> al
                    if (abs(v) >> ah) != 0:
                        kinds.append(("b", t & 1))
                    elif t == 1:
                        kinds.append(("n", 1 if v > 0 else 0))
                    else:
                        kinds.append(("z", 0))
                ptr = 0
                n_pos = 63

                def flush_bits(lo, hi):
                    for i in range(lo, hi):
                        if kinds[i][0] == "b":
                            stream.append(("bits", kinds[i][1], 1))

                newly = [i for i, kv in enumerate(kinds) if kv[0] == "n"]
                for k_star in newly:
                    zs = [i for i in range(ptr, k_star)
                          if kinds[i][0] == "z"]
                    r = len(zs)
                    while r > 15:
                        span_end = zs[15]
                        stream.append(("sym", 0xF0))
                        flush_bits(ptr, span_end + 1)
                        ptr = span_end + 1
                        zs = zs[16:]
                        r -= 16
                    stream.append(("sym", (r << 4) | 1))
                    stream.append(("bits", kinds[k_star][1], 1))
                    flush_bits(ptr, k_star)
                    ptr = k_star + 1
                if ptr < n_pos:
                    stream.append(("sym", 0x00))     # EOB (run of 1)
                    flush_bits(ptr, n_pos)
            emit_scan(stream, [ci + 1], 1, 63, ah, al, tc=1)

    out += b"\xff\xd9"
    return bytes(out)


def synth_jpeg_gray(w: int, h: int, value: int, q: int = 16) -> bytes:
    """Solid-gray baseline JPEG with a uniform quant table — decodes to
    exactly ``clip(floor((QDC*q + 1028) / 8), 0, 255)`` with
    ``QDC = floor(8*(value-128)/q + 0.5)`` (the planted-oracle form)."""
    px = np.full((h, w), value, dtype=np.uint8)
    return encode_jpeg(px, quant=np.full(64, q, dtype=np.int64))


def jpeg_solid_gray_decoded_value(value: int, q: int = 16) -> int:
    """The closed form the oracle reproduces in SQL."""
    qdc = int(np.floor(8.0 * (value - 128) / q + 0.5))
    return int(np.clip(np.floor((qdc * q + 1028) / 8.0), 0, 255))
