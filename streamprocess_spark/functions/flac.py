"""FLAC codec (SURVEY §2.1 S15), dependency-free NumPy + stdlib.

The reference accepts FLAC uploads and decodes them via soundfile
(src/workers/stt_worker.py:381-394; accepted encodings
protos/stream_process.proto:75-81). No codec library exists in this
container, so this is a from-scratch implementation of the FLAC
bitstream (https://xiph.org/flac/format.html):

  decoder — full subset needed for real-world PCM16 files:
    - STREAMINFO metadata parse (+ skip of all other block types)
    - frame headers (all blocksize/rate/bps codes, UTF-8 frame numbers,
      CRC-8 verified) and frame CRC-16 verification
    - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
    - residuals: 4-bit and 5-bit Rice methods, any partition order,
      escape partitions
    - stereo decorrelation: left/side, right/side, mid/side
    - wasted-bits-per-sample handling

  encoder — enough to produce real, compressed, spec-conforming files
  for fixtures and the ingestion edge: fixed-blocksize streams,
  per-frame best FIXED predictor order (0-4) with exact-optimal Rice
  parameter search, CONSTANT and VERBATIM fallbacks, true MD5
  signature. (The reference never encodes FLAC; this exists so tests
  and `io/ingest.py` can round-trip real compressed bytes.)

Decoding is lossless, so the oracle strategy is the PNG one
(q92_png_ingest): synthesize known PCM by formula, encode, decode,
and let DuckDB recompute exact sample sums from the formula.

Scale: pure per-row transforms behind Arrow pandas UDFs — map-only,
zero shuffle, embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

import hashlib

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (FLAC uses CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0,
# non-reflected)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.empty(256, dtype=np.uint32)
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
        r = ((r << 8) ^ int(_CRC16_TBL[((r >> 8) ^ b) & 0xFF])) & 0xFFFF
    return r


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over unpacked bits; unary runs are located via
    a precomputed set-bit index + searchsorted (no per-bit Python loop)."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.bits):
            raise ValueError("FLAC bitstream truncated")
        chunk = self.bits[self.pos:end]
        self.pos = end
        val = 0
        for b in chunk.tolist():
            val = (val << 1) | b
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= len(self.ones):
            raise ValueError("FLAC bitstream truncated in unary run")
        one_at = int(self.ones[i])
        q = one_at - self.pos
        self.pos = one_at + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) // 8 * 8

    def byte_pos(self) -> int:
        return self.pos // 8


# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
              6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
              11: 96000}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients per order (FLAC spec §9.2.2)
_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _utf8_encode_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    nbytes = 2
    # k-byte form carries 7-k lead payload bits + 6 per continuation
    while nbytes < 7 and n >= (1 << (7 - nbytes + 6 * (nbytes - 1))):
        nbytes += 1
    out = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 1)]
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead_mask | (n >> (6 * (nbytes - 1))))
    return bytes(reversed(out))


def _utf8_decode_number(rd: _BitReader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        cont = rd.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        n = (n << 6) | (cont & 0x3F)
    return n


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rice_cost(u: np.ndarray, p: int) -> int:
    # exact bit cost of one partition at parameter p
    return int((u >> p).sum()) + len(u) * (1 + p)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    best_p, best_c = 0, _rice_cost(u, 0)
    for p in range(1, 15):
        c = _rice_cost(u, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return np.where(v >= 0, v << 1, (-v << 1) - 1)


def _write_rice_residual(bw: _BitWriter, resid: np.ndarray, p: int) -> None:
    u = _zigzag(resid)
    for val in u.tolist():
        q = val >> p
        bw.write(0, q)
        bw.write(1, 1)
        bw.write(val & ((1 << p) - 1), p)


def _encode_frame(pcm: np.ndarray, frame_no: int, sr: int, bps: int) -> bytes:
    n = len(pcm)
    hdr = bytearray([0xFF, 0xF8])
    hdr.append((0b0111 << 4) | 0b1101)        # 16-bit blocksize-1; 16-bit Hz
    hdr.append((0b0000 << 4) | (0b100 << 1))  # mono; 16 bps
    hdr += _utf8_encode_number(frame_no)
    hdr += (n - 1).to_bytes(2, "big")
    hdr += sr.to_bytes(2, "big")
    hdr.append(crc8(bytes(hdr)))

    bw = _BitWriter()
    for b in hdr:
        bw.write(b, 8)

    x = pcm.astype(np.int64)
    if np.all(x == x[0]):                      # CONSTANT
        bw.write(0b000000, 7)                  # pad+type(000000)
        bw.write(0, 1)                         # no wasted bits
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
    else:
        # best FIXED order by exact rice cost (order capped by length)
        best = None  # (total_bits, order, resid, p)
        resid = x
        for order in range(0, min(4, n - 1) + 1):
            if order > 0:
                resid = np.diff(resid)
            r = x[order:] if order == 0 else resid
            p, cost = _best_rice_param(_zigzag(r))
            total = order * bps + cost
            if best is None or total < best[0]:
                best = (total, order, r.copy(), p)
        total, order, r, p = best
        if total + 8 >= n * bps:               # VERBATIM fallback
            bw.write(0b0000001, 7)
            bw.write(0, 1)
            for v in x.tolist():
                bw.write(int(v) & ((1 << bps) - 1), bps)
        else:
            bw.write(0b0001000 | order, 7)
            bw.write(0, 1)
            for v in x[:order].tolist():       # warmup
                bw.write(int(v) & ((1 << bps) - 1), bps)
            bw.write(0b00, 2)                  # 4-bit rice method
            bw.write(0, 4)                     # partition order 0
            bw.write(p, 4)
            _write_rice_residual(bw, r, p)
    bw.align()
    body = bw.bytes()
    return body + crc16(body).to_bytes(2, "big")


def np_encode_flac(pcm16: np.ndarray, sr: int = 16000,
                   block_size: int = 4096) -> bytes:
    """Encode mono int16 PCM to a spec-conforming FLAC stream."""
    x = np.asarray(pcm16, dtype=np.int16)
    n = len(x)
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    info = bytearray()
    info += block_size.to_bytes(2, "big") * 2          # min/max blocksize
    info += (0).to_bytes(3, "big") * 2                 # min/max framesize: unknown
    # 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit total samples
    packed = (sr << 44) | (0 << 41) | (15 << 36) | n
    info += packed.to_bytes(8, "big")
    info += md5
    out = bytearray(b"fLaC")
    out.append(0x80)                                   # last block, STREAMINFO
    out += len(info).to_bytes(3, "big")
    out += info
    for fno, start in enumerate(range(0, n, block_size)):
        out += _encode_frame(x[start:start + block_size], fno, sr, 16)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_residual(rd: _BitReader, n: int, order: int) -> np.ndarray:
    method = rd.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = rd.read(4)
    n_parts = 1 << part_order
    if n % n_parts:
        raise ValueError("partition count does not divide blocksize")
    if n // n_parts < order:
        # spec: first partition holds (n >> part_order) - order samples,
        # which must not be negative; a crafted stream (e.g. n=4, FIXED
        # order 4, partition order 2) would otherwise write out of range
        raise ValueError("partition order too large for predictor order")
    out = np.empty(n - order, dtype=np.int64)
    w = 0
    for part in range(n_parts):
        cnt = n // n_parts - (order if part == 0 else 0)
        p = rd.read(plen)
        if p == escape:                     # raw residuals, fixed width
            width = rd.read(5)
            for i in range(cnt):
                out[w + i] = rd.read_signed(width) if width else 0
        else:
            mask = (1 << p) - 1
            for i in range(cnt):
                q = rd.read_unary()
                u = (q << p) | (rd.read(p) if p else 0)
                out[w + i] = (u >> 1) ^ -(u & 1)   # unzigzag
        w += cnt
    return out


def _restore_fixed(warmup: np.ndarray, resid: np.ndarray,
                   order: int) -> np.ndarray:
    """Integrate an order-o difference signal: o cumulative sums, each
    seeded from the warmup's difference pyramid (vectorized, no
    per-sample loop)."""
    if order == 0:
        return resid
    pyramid = [warmup.astype(np.int64)]
    for _ in range(order - 1):
        pyramid.append(np.diff(pyramid[-1]))
    v = resid
    for k in range(order, 0, -1):
        v = pyramid[k - 1][-1] + np.cumsum(v)
    return np.concatenate([warmup.astype(np.int64), v])


def _restore_lpc(warmup: np.ndarray, resid: np.ndarray,
                 coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    x = np.concatenate([warmup.astype(np.int64),
                        np.zeros(len(resid), dtype=np.int64)])
    c = np.array(coefs, dtype=np.int64)[::-1]
    for i in range(len(resid)):             # inherently sequential
        pred = int(np.dot(c, x[i:i + order])) >> shift
        x[order + i] = pred + resid[i]
    return x


def _read_subframe(rd: _BitReader, n: int, bps: int) -> np.ndarray:
    if rd.read(1):
        raise ValueError("subframe padding bit set")
    stype = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.read_unary() + 1
        bps -= wasted
    if stype == 0:                           # CONSTANT
        v = rd.read_signed(bps)
        out = np.full(n, v, dtype=np.int64)
    elif stype == 1:                         # VERBATIM
        out = np.array([rd.read_signed(bps) for _ in range(n)],
                       dtype=np.int64)
    elif 8 <= stype <= 12:                   # FIXED order 0-4
        order = stype - 8
        warmup = np.array([rd.read_signed(bps) for _ in range(order)],
                          dtype=np.int64)
        resid = _read_residual(rd, n, order)
        out = _restore_fixed(warmup, resid, order)
    elif stype >= 32:                        # LPC order 1-32
        order = (stype & 31) + 1
        warmup = np.array([rd.read_signed(bps) for _ in range(order)],
                          dtype=np.int64)
        prec = rd.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = rd.read_signed(5)
        coefs = [rd.read_signed(prec) for _ in range(order)]
        resid = _read_residual(rd, n, order)
        out = _restore_lpc(warmup, resid, coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted if wasted else out


def np_decode_flac(raw: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC stream → (float32 samples interleaved, sample_rate,
    channels). Verifies magic, frame-header CRC-8 and frame CRC-16."""
    if raw[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = channels = bps_default = None
    total = 0
    while True:                              # metadata blocks
        hdr = raw[pos:pos + 4]
        if len(hdr) < 4:
            raise ValueError("FLAC metadata truncated")
        last, btype = bool(hdr[0] & 0x80), hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = raw[pos + 4: pos + 4 + blen]
        if btype == 0:                       # STREAMINFO
            packed = int.from_bytes(body[10:18], "big")
            sr = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps_default = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
        pos += 4 + blen
        if last:
            break
    if sr is None:
        raise ValueError("FLAC missing STREAMINFO")

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    # one reader over the whole frame region, reused across frames —
    # unpacking per frame would make an F-frame file O(F * stream_bytes)
    buf = raw[pos:]
    rd = _BitReader(buf)
    while got < total and rd.byte_pos() < len(buf):
        frame_start = rd.byte_pos()
        sync = rd.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync 0x{sync:04x}")
        rd.read(1)                           # reserved
        rd.read(1)                           # blocking strategy
        bs_code = rd.read(4)
        rate_code = rd.read(4)
        chan_code = rd.read(4)
        bps_code = rd.read(3)
        rd.read(1)                           # reserved
        _utf8_decode_number(rd)
        if bs_code == 6:
            n = rd.read(8) + 1
        elif bs_code == 7:
            n = rd.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODE:
            n = _BLOCKSIZE_CODE[bs_code]
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if rate_code == 12:
            rd.read(8)
        elif rate_code in (13, 14):
            rd.read(16)
        elif rate_code not in _RATE_CODE and rate_code != 0:
            raise ValueError(f"bad sample-rate code {rate_code}")
        hdr_len = rd.byte_pos() - frame_start
        want_crc8 = rd.read(8)
        if crc8(buf[frame_start:frame_start + hdr_len]) != want_crc8:
            raise ValueError("frame header CRC-8 mismatch")
        bps = _BPS_CODE.get(bps_code, bps_default)

        if chan_code <= 7:                   # independent channels
            n_sub = chan_code + 1
            subs = [_read_subframe(rd, n, bps) for _ in range(n_sub)]
        elif chan_code == 8:                 # left/side
            left = _read_subframe(rd, n, bps)
            side = _read_subframe(rd, n, bps + 1)
            subs = [left, left - side]
        elif chan_code == 9:                 # right/side
            side = _read_subframe(rd, n, bps + 1)
            right = _read_subframe(rd, n, bps)
            subs = [right + side, right]
        elif chan_code == 10:                # mid/side
            mid = _read_subframe(rd, n, bps)
            side = _read_subframe(rd, n, bps + 1)
            m2 = (mid << 1) | (side & 1)     # restore dropped LSB
            left = (m2 + side) >> 1
            subs = [left, left - side]
        else:
            raise ValueError(f"reserved channel code {chan_code}")
        if len(subs) != channels:
            raise ValueError("frame channel count != STREAMINFO")
        rd.align()
        frame_len = rd.byte_pos() - frame_start
        want_crc16 = rd.read(16)
        if crc16(buf[frame_start:frame_start + frame_len]) != want_crc16:
            raise ValueError("frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].append(subs[c])
        got += n

    full = [np.concatenate(c)[:total] if c else np.empty(0, np.int64)
            for c in chans]
    inter = np.empty(len(full[0]) * channels, dtype=np.int64)
    for c in range(channels):
        inter[c::channels] = full[c]
    scale = float(1 << (bps_default - 1))
    return (inter.astype(np.float32) / scale), sr, channels
