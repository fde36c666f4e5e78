"""FLAC lossless audio codec — pure stdlib/numpy (no external audio libs).

Reference audio surface: /root/reference/prompture/media/audio.py:1-196
(load/duration/features over common formats). MP3/OGG *decode* needs
librosa which is absent from this environment (stages/mp3.py covers their
metadata); FLAC is fully implementable stdlib-only — zlib-free, just
Rice coding + fixed linear predictors — so this module provides a REAL
lossless audio path with an encode inverse for planted round-trip
oracles (same pattern as WAV/BMP/PNG/AVI in stages/multimodal.py).

Subset implemented (documented, matches what ``encode_flac`` emits plus
the common fixed-predictor profile):

* 8/16-bit PCM, 1-2 channels, independent channel coding (no mid/side)
* subframe types CONSTANT / VERBATIM / FIXED order 0-4 (LPC subframes
  raise ``NotImplementedError`` — our encoder never emits them)
* partitioned-Rice residuals, both 4-bit (method 0) and 5-bit (method 1)
  parameter widths, any partition order, escape partitions
* UTF-8-style coded frame numbers, CRC-8 header / CRC-16 frame checks

Scale notes: decode is per-payload inside an actor-pool ``map_batches``
stage; the Rice hot loop is two O(1) numpy indexings per residual via a
bit-rank prefix array (no per-bit Python scanning), and fixed-predictor
reconstruction is ``order`` vectorized cumsums — no per-sample Python
arithmetic.
"""
from __future__ import annotations

import hashlib

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (FLAC frame checksums)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _make_crc_table(0x07, 8)
_CRC16_TBL = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TBL[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ int(_CRC16_TBL[(r >> 8) ^ b])
    return r


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator (FLAC is big-endian at the bit level)."""

    def __init__(self):
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self._out)


_POW2 = (np.int64(1) << np.arange(63, dtype=np.int64))[::-1]  # MSB-first


class _BitReader:
    """MSB-first reader over an unpacked bit array with a one-rank prefix
    (rank array powers the O(1)-per-residual Rice loop)."""

    def __init__(self, payload: bytes):
        self.bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
        self.n = self.bits.size
        self.pos = 0
        self._ones = None
        self._rank = None

    def _ensure_rank(self):
        if self._ones is None:
            self._ones = np.flatnonzero(self.bits)
            # rank[j] = number of one-bits strictly before position j
            r = np.zeros(self.n + 1, dtype=np.int64)
            np.cumsum(self.bits, out=r[1:])
            self._rank = r

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        sl = self.bits[self.pos:self.pos + nbits].astype(np.int64)
        if sl.size < nbits:
            raise ValueError("flac: truncated stream")
        self.pos += nbits
        return int(sl @ _POW2[63 - nbits:])

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        self._ensure_rank()
        idx = self._rank[self.pos]
        if idx >= self._ones.size:
            raise ValueError("flac: truncated unary code")
        t = int(self._ones[idx])
        q = t - self.pos
        self.pos = t + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        assert self.pos % 8 == 0
        return self.pos // 8

    def rice_block(self, n: int, k: int) -> np.ndarray:
        """Decode ``n`` Rice(k) codes. Terminator hopping is O(1) per
        code: after a terminator at bit t, the next code's unary run
        starts at t+1+k, and its terminator is the one-bit whose rank is
        rank[t+1+k] — two array indexings, no bit scanning."""
        if n == 0:
            return np.empty(0, dtype=np.int64)
        self._ensure_rank()
        ones, rank = self._ones, self._rank
        terms = np.empty(n, dtype=np.int64)
        starts = np.empty(n, dtype=np.int64)
        pos = self.pos
        nbits = self.n
        try:
            for i in range(n):
                starts[i] = pos
                t = ones[rank[pos]]
                terms[i] = t
                pos = t + 1 + k
        except IndexError:
            raise ValueError("flac: truncated rice partition") from None
        if pos > nbits:
            raise ValueError("flac: truncated rice partition")
        self.pos = int(pos)
        q = terms - starts
        if k:
            # gather the k suffix bits of every code in one shot
            idx = terms[:, None] + np.arange(1, k + 1, dtype=np.int64)
            suf = self.bits[idx].astype(np.int64) @ _POW2[63 - k:]
            u = (q << k) | suf
        else:
            u = q
        return (u >> 1) ^ -(u & 1)  # zigzag unfold


# ---------------------------------------------------------------------------
# fixed predictors
# ---------------------------------------------------------------------------


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x.astype(np.int64), order) if order else x.astype(np.int64)


def _fixed_restore(warmup: np.ndarray, resid: np.ndarray,
                   order: int) -> np.ndarray:
    """Invert ``order`` differencing passes: seed each integration with
    the j-th difference of the warmup samples (vectorized cumsums)."""
    x = resid.astype(np.int64)
    w = warmup.astype(np.int64)
    for j in range(order - 1, -1, -1):
        seed = np.diff(w, j)[0] if j else w[0]
        x = np.cumsum(np.concatenate(([seed], x)))
    return x


def _utf8_number(v: int) -> bytes:
    """FLAC's UTF-8-style coded number (extended to 36 bits)."""
    if v < 0x80:
        return bytes([v])
    for nbytes, hdr in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                        (6, 0xFC), (7, 0xFE)):
        if v < (1 << (6 * (nbytes - 1) + (7 - nbytes if nbytes < 7 else 0))):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (v & 0x3F)
                v >>= 6
            out[0] = hdr | v
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nb = 0                              # leading one bits = total bytes
    while nb < 8 and (b0 << nb) & 0x80:
        nb += 1
    if nb < 2 or nb > 7:
        raise ValueError("flac: bad coded number lead byte")
    v = b0 & ((1 << (7 - nb)) - 1) if nb < 7 else 0
    for _ in range(nb - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_BLOCKSIZE = 4096


def _pick_rice_k(u: np.ndarray) -> int:
    if u.size == 0 or not u.any():
        return 0
    mean = float(u.mean())
    k = max(0, int(np.ceil(np.log2(mean + 1.0))) - 1) if mean > 0 else 0
    # refine around the estimate: pick the k with the smallest exact cost
    best_k, best_cost = 0, None
    for kk in range(max(0, k - 1), min(k + 3, 30)):
        cost = int((u >> kk).sum()) + u.size * (1 + kk)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = kk, cost
    return best_k


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    n = x.size
    if n and np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0b000000, 6)           # CONSTANT
        bw.write(0, 1)
        bw.write_signed(int(x[0]), bps)
        return
    order = 2 if n > 8 else 0
    resid = _fixed_residual(x, order)
    u = ((resid << 1) ^ (resid >> 63)).astype(np.uint64)
    k = _pick_rice_k(u.astype(np.int64))
    rice_bits = int((u >> np.uint64(k)).sum()) + resid.size * (1 + k)
    if k >= 15 or rice_bits > n * bps:
        bw.write(0, 1)
        bw.write(0b000001, 6)           # VERBATIM
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
        return
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)       # FIXED
    bw.write(0, 1)                      # no wasted bits
    for v in x[:order]:
        bw.write_signed(int(v), bps)
    bw.write(0b00, 2)                   # rice method 0 (4-bit params)
    bw.write(0, 4)                      # partition order 0
    bw.write(k, 4)
    uq = (u >> np.uint64(k)).astype(np.int64)
    low = (u & np.uint64((1 << k) - 1)).astype(np.int64)
    for i in range(resid.size):
        bw.write_unary(int(uq[i]))
        if k:
            bw.write(int(low[i]), k)


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int = 16) -> bytes:
    """Encode PCM → FLAC. ``samples``: int array, shape (n,) mono or
    (n, ch) interleaved; ``bps`` 8 or 16. Lossless: ``decode_flac``
    returns the samples bit-exactly."""
    if bps not in (8, 16):
        raise ValueError("bps must be 8 or 16")
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if ch not in (1, 2):
        raise ValueError("1 or 2 channels only")
    lim = 1 << (bps - 1)
    if s.size and (s.min() < -lim or s.max() >= lim):
        raise ValueError("sample out of range for bps")
    if not 1 <= sample_rate < (1 << 16):
        raise ValueError("sample rate must fit 16 bits")

    dt = "<i1" if bps == 8 else "<i2"
    md5 = hashlib.md5(np.ascontiguousarray(s.astype(dt)).tobytes()).digest()

    head = _BitWriter()
    head.write(0x664C6143, 32)          # "fLaC"
    head.write(1, 1)                    # last metadata block
    head.write(0, 7)                    # STREAMINFO
    head.write(34, 24)
    head.write(_BLOCKSIZE, 16)
    head.write(_BLOCKSIZE, 16)
    head.write(0, 24)                   # min frame size unknown
    head.write(0, 24)
    head.write(sample_rate, 20)
    head.write(ch - 1, 3)
    head.write(bps - 1, 5)
    head.write(n, 36)
    for b in md5:
        head.write(b, 8)
    out = bytearray(head.getvalue())

    frame_no = 0
    for off in range(0, max(n, 1), _BLOCKSIZE):
        blk = s[off:off + _BLOCKSIZE]
        bs = blk.shape[0]
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)  # sync
        bw.write(0, 1)                  # reserved
        bw.write(0, 1)                  # fixed-blocksize stream
        bw.write(0b0111, 4)             # blocksize: 16-bit at end
        bw.write(0b1101, 4)             # sample rate: 16-bit Hz at end
        bw.write(ch - 1, 4)             # independent channels
        bw.write(0b100 if bps == 16 else 0b001, 3)
        bw.write(0, 1)                  # reserved
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        bw.write(sample_rate, 16)
        hdr = bw.getvalue()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(crc8(hdr), 8)
        for c in range(ch):
            _encode_subframe(bw2, blk[:, c].astype(np.int64), bps)
        bw2.align()
        body = bw2.getvalue()
        out += body
        out += crc16(body).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BLOCKSIZE_TBL = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}
_RATE_TBL = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
             6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_TBL = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: bad subframe padding bit")
    typ = br.read(6)
    wasted = 0
    if br.read(1):                      # wasted-bits flag
        wasted = br.read_unary() + 1
        bps -= wasted
    if typ == 0:                        # CONSTANT
        x = np.full(bs, br.read_signed(bps), dtype=np.int64)
    elif typ == 1:                      # VERBATIM
        x = np.fromiter((br.read_signed(bps) for _ in range(bs)),
                        dtype=np.int64, count=bs)
    elif 8 <= typ <= 12:                # FIXED order 0-4
        order = typ - 8
        warm = np.fromiter((br.read_signed(bps) for _ in range(order)),
                           dtype=np.int64, count=order)
        resid = _decode_residual(br, bs, order)
        x = _fixed_restore(warm, resid, order) if order else resid
    elif typ >= 32:
        raise NotImplementedError(
            "flac: LPC subframes not supported (encode_flac emits "
            "CONSTANT/VERBATIM/FIXED only; see module docstring)")
    else:
        raise ValueError(f"flac: reserved subframe type {typ}")
    return x << wasted if wasted else x


def _decode_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("flac: partition order does not divide blocksize")
    parts = []
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: predictor order exceeds partition")
        k = br.read(pbits)
        if k == esc:
            raw = br.read(5)
            parts.append(np.fromiter(
                (br.read_signed(raw) if raw else 0 for _ in range(cnt)),
                dtype=np.int64, count=cnt))
        else:
            parts.append(br.rice_block(cnt, k))
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def decode_flac(payload: bytes, verify: bool = True):
    """FLAC → (sample_rate, n_frames, n_channels, bps, samples) with
    ``samples`` int64 shape (n, ch). Subset per module docstring."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    br = _BitReader(payload)
    br.pos = 32
    # metadata blocks
    sr = ch = bps = total = None
    while True:
        last = br.read(1)
        typ = br.read(7)
        length = br.read(24)
        if typ == 0:
            sr_pos = br.pos
            br.read(16)                 # min blocksize
            br.read(16)
            br.read(24)
            br.read(24)
            sr = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            br.pos = sr_pos + (34 * 8)  # skip md5 remainder
        else:
            br.pos += length * 8
        if last:
            break
    if sr is None:
        raise ValueError("flac: missing STREAMINFO")

    chans = [[] for _ in range(ch)]
    got = 0
    while got < total:
        frame_start = br.byte_pos()
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        br.read(1)                      # reserved
        br.read(1)                      # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_TBL:
            bs = _BLOCKSIZE_TBL[bs_code]
        else:
            raise ValueError("flac: reserved blocksize code")
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code not in _RATE_TBL:
            raise ValueError("flac: bad sample-rate code")
        hdr_end = br.pos
        if hdr_end % 8:
            raise ValueError("flac: unaligned frame header")
        expect_crc8 = br.read(8)
        if verify:
            hdr_bytes = payload[frame_start:hdr_end // 8]
            if crc8(hdr_bytes) != expect_crc8:
                raise ValueError("flac: frame header CRC mismatch")
        if chan_code < 8:
            nch = chan_code + 1
            if nch != ch:
                raise ValueError("flac: channel count mismatch")
            fbps = _BPS_TBL.get(bps_code, bps)
            for c in range(ch):
                chans[c].append(_decode_subframe(br, bs, fbps))
        else:
            raise NotImplementedError(
                "flac: stereo decorrelation (left/mid/side) not "
                "supported — encode_flac emits independent channels")
        br.align()
        body_end = br.byte_pos()
        expect_crc16 = br.read(16)
        if verify and crc16(payload[frame_start:body_end]) != expect_crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        got += bs

    out = np.stack([np.concatenate(c)[:total] if c
                    else np.empty(0, dtype=np.int64)
                    for c in chans], axis=1)
    return sr, total, ch, bps, out


def synth_flac(sample_rate: int, n_frames: int, amplitude: int) -> bytes:
    """Mono 16-bit ±amplitude square wave as FLAC (RMS == amplitude
    exactly — same planted contract as multimodal.synth_wav)."""
    samples = np.empty(n_frames, dtype=np.int64)
    samples[0::2] = amplitude
    samples[1::2] = -amplitude
    return encode_flac(samples, sample_rate, bps=16)
