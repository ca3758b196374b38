"""Baseline JPEG codec (SURVEY §2.1 S15), dependency-free NumPy.

The reference accepts JPEG scans on the OCR path and decodes via
cv2.imdecode (src/workers/ocr_worker.py:283-308). No codec library is
present in this container, so this implements the baseline sequential
DCT process from scratch (ITU-T T.81):

  decoder — 8-bit grayscale baseline:
    - marker walk (APPn/COM skip, DQT multi-table, DHT multi-table,
      SOF0, SOS, DRI/RSTn restart-interval support, EOI)
    - canonical Huffman reconstruction from BITS/HUFFVAL
    - entropy decode with 0xFF00 unstuffing, DC prediction,
      receive/extend, dequantize, dezigzag, float IDCT, level shift
    - color (multi-component) SOF0 rejected with a documented
      NotImplementedError — the reference's OCR path grayscales
      immediately after decode (image_processor.py preprocessing)

  encoder — baseline grayscale with the T.81 Annex K luminance
    quantization table (libjpeg quality scaling) and Annex K standard
    Huffman tables; used by fixtures and the ingestion edge.

Oracle strategy: JPEG is lossy, but a constant 8x8 block has energy
only in the DC coefficient; choosing block values v with (v-128) even
makes round(8(v-128)/16) exact at quality 50 (q00=16), so
encode→decode is BIT-EXACT for constant-block fixtures and DuckDB can
recompute pixel sums from the block formula (same pattern as the
lossless PNG oracle, q92_png_ingest).

Scale: per-row map-only transforms behind Arrow pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# T.81 Annex K.1 luminance quantization table (row-major)
_QTBL_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

# T.81 Annex K.3: BITS (codes per length 1..16) and HUFFVAL for the
# standard luminance DC and AC tables
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag scan order: _ZIGZAG[k] = flat row-major index of the k-th
# zigzag coefficient
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: y = C @ x
_C = np.array([
    [np.cos((2 * j + 1) * i * np.pi / 16) *
     (np.sqrt(1 / 8) if i == 0 else np.sqrt(2 / 8))
     for j in range(8)] for i in range(8)
])


def _canonical_codes(bits: list[int], vals: list[int]):
    """T.81 Annex C: (code, length) per symbol from BITS/HUFFVAL."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


_DC_ENC, _DC_DEC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC, _AC_DEC = _canonical_codes(_AC_BITS, _AC_VALS)


def quality_qtable(quality: int = 50) -> np.ndarray:
    """libjpeg quality scaling of the Annex K luminance table."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (_QTBL_LUM * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# bit I/O with 0xFF stuffing
# ---------------------------------------------------------------------------


class _StuffWriter:
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
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s
        return bytes(self.out)


class _StuffReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops before markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        clean = bytearray()
        # real RSTn positions (clean-stream byte offsets), recorded here
        # where marker context is unambiguous — an unstuffed data 0xFF
        # followed by an entropy byte in 0xD0-0xD7 is otherwise
        # indistinguishable from a restart marker (baseline JPEG has no
        # CRC to catch a false resync)
        restarts: list[int] = []
        while pos < len(data):
            b = data[pos]
            if b == 0xFF:
                nxt = data[pos + 1] if pos + 1 < len(data) else None
                if nxt == 0x00:
                    clean.append(0xFF)
                    pos += 2
                    continue
                if nxt is not None and 0xD0 <= nxt <= 0xD7:  # RSTn
                    restarts.append(len(clean))
                    clean.append(0xFF)       # keep as sentinel
                    clean.append(nxt)
                    pos += 2
                    continue
                break                         # real marker: end of scan
            clean.append(b)
            pos += 1
        self.data = bytes(clean)
        self.end_pos = pos
        self.restarts = restarts
        self._rst_i = 0
        self.bits = np.unpackbits(np.frombuffer(self.data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG entropy data truncated")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next recorded RSTn marker (byte-aligned).
        Seeks via positions recorded during unstuffing, never by byte
        rescan — a data 0xFF + 0xD0-0xD7 pair cannot cause a false
        resync."""
        self.pos = (self.pos + 7) // 8 * 8
        byte = self.pos // 8
        while (self._rst_i < len(self.restarts)
               and self.restarts[self._rst_i] < byte):
            self._rst_i += 1
        if self._rst_i >= len(self.restarts):
            raise ValueError("expected JPEG restart marker")
        start = self.restarts[self._rst_i]
        self._rst_i += 1
        self.pos = (start + 2) * 8


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: s-bit raw value → signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def np_encode_jpeg_gray(img: np.ndarray, quality: int = 50) -> bytes:
    """Encode an HxW uint8 grayscale image as baseline JPEG. Edges are
    replicated to 8-pixel multiples (decoder crops back via SOF dims)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    qt = quality_qtable(quality)

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + qt.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes())
    sof = b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01" \
        + b"\x01\x11\x00"                              # comp 1, 1x1, qtbl 0
    out += _seg(0xC0, sof)
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, b"\x01\x01\x00\x00\x3F\x00")     # 1 comp, tables 0/0

    # block DCT, vectorized: (nb, 8, 8) → quantized zigzag ints
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64) - 128.0
    )
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    quant = np.round(coef / qt).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]

    bw = _StuffWriter()
    prev_dc = 0
    for zz in quant:
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        s = int(abs(diff)).bit_length()
        code, ln = _DC_ENC[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        nz = np.flatnonzero(zz[1:])
        prev = 0
        for idx in nz.tolist():
            run = idx - prev
            prev = idx + 1
            while run >= 16:
                code, ln = _AC_ENC[0xF0]               # ZRL
                bw.write(code, ln)
                run -= 16
            v = int(zz[1 + idx])
            s = abs(v).bit_length()
            code, ln = _AC_ENC[run * 16 + s]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
        if len(nz) == 0 or nz[-1] < 62:
            code, ln = _AC_ENC[0x00]                   # EOB
            bw.write(code, ln)
    out += bw.flush()
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def np_decode_jpeg_gray(raw: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG → HxW uint8."""
    if raw[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_q = dc_tbl = ac_tbl = None
    restart_interval = 0
    scan_at = None
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = raw[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(raw[pos + 2: pos + 4], "big")
        if ln < 2 or pos + 2 + ln > len(raw):
            raise ValueError("truncated JPEG segment")
        body = raw[pos + 4: pos + 2 + ln]
        if marker == 0xDB:                              # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                zz = np.frombuffer(body[i + 1: i + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = zz
                qtables[tid] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:                            # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                _, dec = _canonical_codes(bits, vals)
                huff[(cls, tid)] = dec
                i += 17 + n
        elif marker == 0xC0:                            # SOF0 baseline
            if len(body) < 9:                           # 6 fixed + 1 comp
                raise ValueError("short SOF0 segment")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp != 1:
                raise NotImplementedError(
                    "color JPEG needs chroma upsampling (cv2 path in the "
                    "reference, ocr_worker.py:283-308); grayscale only"
                )
            if body[7] != 0x11:
                raise NotImplementedError("subsampled grayscale JPEG")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process 0x{marker:02x} (only baseline SOF0)"
            )
        elif marker == 0xDD:                            # DRI
            if len(body) < 2:
                raise ValueError("short DRI segment")
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:                            # SOS
            if len(body) < 6:                           # ns + 1 comp + 3
                raise ValueError("short SOS segment")
            dc_tbl = body[2] >> 4
            ac_tbl = body[2] & 0x0F
            scan_at = pos + 2 + ln
            break
        pos += 2 + ln
    if h is None or scan_at is None:
        raise ValueError("JPEG missing SOF0/SOS")
    if not (1 <= h <= 20000 and 1 <= w <= 20000):
        raise ValueError(f"JPEG dims {w}x{h} out of sane range")
    if comp_q not in qtables:
        raise ValueError(f"JPEG missing quant table {comp_q}")
    if (0, dc_tbl) not in huff or (1, ac_tbl) not in huff:
        raise ValueError("JPEG missing Huffman table referenced by SOS")
    qt = qtables[comp_q]
    dc_dec = huff[(0, dc_tbl)]
    ac_dec = huff[(1, ac_tbl)]

    rd = _StuffReader(raw, scan_at)

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | rd.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    nb = (ph // 8) * (pw // 8)
    quant = np.zeros((nb, 64), dtype=np.int64)
    prev_dc = 0
    for b in range(nb):
        if restart_interval and b and b % restart_interval == 0:
            rd.sync_restart()
            prev_dc = 0
        s = read_symbol(dc_dec)
        if s > 11:                                      # T.81 F.1.2.1.1
            raise ValueError(f"DC category {s} out of baseline range")
        diff = _extend(rd.read(s), s) if s else 0
        prev_dc += diff
        if abs(prev_dc) > (1 << 15):                    # 8-bit baseline bound
            raise ValueError("DC coefficient out of range")
        quant[b, 0] = prev_dc
        k = 1
        while k < 64:
            sym = read_symbol(ac_dec)
            if sym == 0x00:                             # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if sym == 0xF0:                             # ZRL
                k += 16
                continue
            if size > 10:                               # T.81 F.1.2.2.1
                raise ValueError(f"AC size {size} out of baseline range")
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            quant[b, k] = _extend(rd.read(size), size)
            k += 1

    coef = np.zeros((nb, 64), dtype=np.float64)
    coef[:, _ZIGZAG] = quant
    coef = coef.reshape(-1, 8, 8) * qt
    pix = np.einsum("ji,njk,kl->nil", _C, coef, _C) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    img = (
        pix.reshape(ph // 8, pw // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)
    )
    return img[:h, :w]
