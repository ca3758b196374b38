"""Baseline JPEG codec (SURVEY §2.1 S15), dependency-free NumPy.

The reference accepts JPEG scans on the OCR path and decodes via
cv2.imdecode (src/workers/ocr_worker.py:283-308). No codec library is
present in this container, so this implements the baseline sequential
DCT process from scratch (ITU-T T.81):

  decoder — 8-bit baseline, grayscale AND color:
    - marker walk (APPn/COM skip, DQT multi-table, DHT multi-table,
      SOF0, SOS, DRI/RSTn restart-interval support, EOI), with
      short-segment totality (every malformed stream raises ValueError
      so the ingest dead-letter boundary holds)
    - canonical Huffman reconstruction from BITS/HUFFVAL
    - entropy decode with 0xFF00 unstuffing, DC prediction,
      receive/extend, dequantize, dezigzag, float IDCT, level shift
    - 3-component YCbCr with any (h,v) sampling in {1,2} — 4:4:4,
      4:2:0, 4:2:2 — single interleaved scan, per-component DC
      predictors, chroma upsampling by replication, BT.601 YCbCr→RGB
    - progressive/extended processes and 4-component (CMYK) streams
      rejected with documented NotImplementedError

  encoder — baseline grayscale and color with the T.81 Annex K
    luminance/chrominance quantization tables (libjpeg quality
    scaling) and Annex K standard Huffman tables; 4:4:4 and 4:2:0
    subsampling (2x2 box chroma downsample). Used by fixtures and the
    ingestion edge. The color encoder shares one DHT pair across
    components (spec-legal; the decoder reads whatever tables the
    stream declares, so external JPEGs with separate chroma tables
    decode fine).

Oracle strategy: JPEG is lossy, but a constant 8x8 block has energy
only in the DC coefficient; choosing block values v with (v-128)
divisible by q00/8-aligned steps makes round(8(v-128)/q00) exact at
quality 50 (luma q00=16 → (v-128) even; chroma q00=17 → (v-128) a
multiple of 17), so encode→decode is BIT-EXACT per channel for
constant-block fixtures — in 4:2:0 too, when chroma is constant per
16x16 tile (the 2x2 box downsample and replication upsample are then
both exact). DuckDB recomputes per-channel pixel sums from the block
formula (same pattern as the lossless PNG oracle, q92_png_ingest).

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

# T.81 Annex K.2 chrominance quantization table
_QTBL_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
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


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


def quality_qtable(quality: int = 50) -> np.ndarray:
    """libjpeg quality scaling of the Annex K luminance table."""
    return _scaled_qtable(_QTBL_LUM, quality)


def quality_qtable_chroma(quality: int = 50) -> np.ndarray:
    """libjpeg quality scaling of the Annex K chrominance table."""
    return _scaled_qtable(_QTBL_CHROMA, quality)


# ---------------------------------------------------------------------------
# BT.601 full-range color conversion (JFIF)
# ---------------------------------------------------------------------------


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 RGB → HxWx3 uint8 YCbCr (JFIF / BT.601)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 YCbCr → HxWx3 uint8 RGB (JFIF / BT.601)."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


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


def _quant_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a multiple-of-8 plane → quantized zigzag ints
    (vectorized DCT over every block at once)."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8).astype(np.float64) - 128.0
    )
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    return np.round(coef / qt).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]


def _encode_block(bw: _StuffWriter, zz: np.ndarray, prev_dc: int) -> int:
    """Entropy-code one quantized zigzag block; returns its DC value
    (the next block's predictor)."""
    diff = int(zz[0]) - prev_dc
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
            c2, l2 = _AC_ENC[0xF0]                     # ZRL
            bw.write(c2, l2)
            run -= 16
        v = int(zz[1 + idx])
        s2 = abs(v).bit_length()
        c2, l2 = _AC_ENC[run * 16 + s2]
        bw.write(c2, l2)
        bw.write(v if v > 0 else v + (1 << s2) - 1, s2)
    if len(nz) == 0 or nz[-1] < 62:
        c2, l2 = _AC_ENC[0x00]                         # EOB
        bw.write(c2, l2)
    return int(zz[0])


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

    quant = _quant_blocks(padded, qt)
    bw = _StuffWriter()
    prev_dc = 0
    for zz in quant:
        prev_dc = _encode_block(bw, zz, prev_dc)
    out += bw.flush()
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


def np_encode_jpeg_ycbcr(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
    quality: int = 50, subsample: str = "420",
) -> bytes:
    """Encode full-resolution YCbCr planes (uint8, same HxW) as a
    baseline interleaved-scan color JPEG (4:2:0 or 4:4:4)."""
    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if cb.shape != (h, w) or cr.shape != (h, w):
        raise ValueError("YCbCr planes must share dimensions")
    if subsample == "420":
        hs = vs = 2

        def down(p: np.ndarray) -> np.ndarray:
            # 2x2 box mean on even-padded planes (exact for per-tile
            # constant chroma — the fixture/oracle path)
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            pp = np.pad(p, ((0, ph - h), (0, pw - w)),
                        mode="edge").astype(np.float64)
            return np.round(
                pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            ).astype(np.uint8)

        cbs, crs = down(np.asarray(cb, np.uint8)), down(np.asarray(cr, np.uint8))
    elif subsample == "444":
        hs = vs = 1
        cbs, crs = np.asarray(cb, np.uint8), np.asarray(cr, np.uint8)
    else:
        raise ValueError(f"unsupported subsampling {subsample!r}")

    qt_l, qt_c = quality_qtable(quality), quality_qtable_chroma(quality)

    out = bytearray(b"\xFF\xD8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + qt_l.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes())
    out += _seg(0xDB, b"\x01" + qt_c.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes())
    sof = (b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03"
           + bytes([1, (hs << 4) | vs, 0])             # Y: hsxvs, qtbl 0
           + bytes([2, 0x11, 1])                       # Cb: 1x1, qtbl 1
           + bytes([3, 0x11, 1]))                      # Cr: 1x1, qtbl 1
    out += _seg(0xC0, sof)
    # one shared Annex K.3 table pair for all components (spec-legal)
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, b"\x03" + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3F\x00")

    # pad planes to MCU multiples
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    yp = np.pad(y, ((0, mcuy * mcu_h - h), (0, mcux * mcu_w - w)), mode="edge")
    ch_h, ch_w = mcuy * 8, mcux * 8
    cbp = np.pad(cbs, ((0, ch_h - cbs.shape[0]), (0, ch_w - cbs.shape[1])),
                 mode="edge")
    crp = np.pad(crs, ((0, ch_h - crs.shape[0]), (0, ch_w - crs.shape[1])),
                 mode="edge")

    def qb(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
        zz = _quant_blocks(plane, qt)
        return zz.reshape(plane.shape[0] // 8, plane.shape[1] // 8, 64)

    yq, cbq, crq = qb(yp, qt_l), qb(cbp, qt_c), qb(crp, qt_c)

    bw = _StuffWriter()
    prev = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vs):                       # Y blocks raster
                for bx in range(hs):
                    prev[0] = _encode_block(
                        bw, yq[my * vs + by, mx * hs + bx], prev[0]
                    )
            prev[1] = _encode_block(bw, cbq[my, mx], prev[1])
            prev[2] = _encode_block(bw, crq[my, mx], prev[2])
    out += bw.flush()
    out += b"\xFF\xD9"
    return bytes(out)


def np_encode_jpeg_color(rgb: np.ndarray, quality: int = 50,
                         subsample: str = "420") -> bytes:
    """Encode an HxWx3 uint8 RGB image as a baseline color JPEG."""
    ycc = rgb_to_ycbcr(np.asarray(rgb, dtype=np.uint8))
    return np_encode_jpeg_ycbcr(
        ycc[..., 0], ycc[..., 1], ycc[..., 2], quality, subsample
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def np_decode_jpeg(raw: bytes, color_space: str = "rgb") -> np.ndarray:
    """Decode a baseline JPEG: 1-component grayscale → HxW uint8;
    3-component YCbCr (any sampling in {1,2}, single interleaved scan)
    → HxWx3 uint8 in `color_space` ("rgb" or "ycbcr")."""
    if raw[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[dict] = []        # id, hs, vs, tq per SOF0 component
    scan_map: dict[int, tuple[int, int]] = {}  # comp id -> (td, ta)
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
            if len(body) < 6:
                raise ValueError("short SOF0 segment")
            hgt = int.from_bytes(body[1:3], "big")
            wid = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG (CMYK/unknown); gray + YCbCr only"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("short SOF0 segment")
            h, w = hgt, wid
            comps = []
            for c in range(ncomp):
                hv = body[7 + 3 * c]
                comps.append({
                    "id": body[6 + 3 * c], "hs": hv >> 4, "vs": hv & 0x0F,
                    "tq": body[8 + 3 * c],
                })
            for c in comps:
                if c["hs"] not in (1, 2) or c["vs"] not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {c['hs']}x{c['vs']} (1-2 only)"
                    )
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
            if len(body) < 4:
                raise ValueError("short SOS segment")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("short SOS segment")
            for k in range(ns):
                tt = body[2 + 2 * k]
                scan_map[body[1 + 2 * k]] = (tt >> 4, tt & 0x0F)
            scan_at = pos + 2 + ln
            break
        pos += 2 + ln
    if h is None or scan_at is None:
        raise ValueError("JPEG missing SOF0/SOS")
    if not (1 <= h <= 20000 and 1 <= w <= 20000):
        raise ValueError(f"JPEG dims {w}x{h} out of sane range")
    if len(scan_map) != len(comps):
        raise NotImplementedError(
            "non-interleaved multi-scan baseline JPEG"
        )
    for c in comps:
        if c["id"] not in scan_map:
            raise ValueError("SOS references unknown component")
        if c["tq"] not in qtables:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        td, ta = scan_map[c["id"]]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG missing Huffman table referenced by SOS")

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    rd = _StuffReader(raw, scan_at)

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | rd.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    # per-component quantized block store: (rows, cols, 64)
    store = [
        np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int64)
        for c in comps
    ]
    preds = [0] * len(comps)

    def decode_block(ci: int, by: int, bx: int) -> None:
        td, ta = scan_map[comps[ci]["id"]]
        dc_dec, ac_dec = huff[(0, td)], huff[(1, ta)]
        s = read_symbol(dc_dec)
        if s > 11:                                      # T.81 F.1.2.1.1
            raise ValueError(f"DC category {s} out of baseline range")
        diff = _extend(rd.read(s), s) if s else 0
        preds[ci] += diff
        if abs(preds[ci]) > (1 << 15):                  # 8-bit baseline bound
            raise ValueError("DC coefficient out of range")
        blk = store[ci][by, bx]
        blk[0] = preds[ci]
        k = 1
        while k < 64:
            sym = read_symbol(ac_dec)
            if sym == 0x00:                             # EOB
                break
            if sym == 0xF0:                             # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            if size > 10:                               # T.81 F.1.2.2.1
                raise ValueError(f"AC size {size} out of baseline range")
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            blk[k] = _extend(rd.read(size), size)
            k += 1

    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                rd.sync_restart()
                preds[:] = [0] * len(preds)
            for ci, c in enumerate(comps):
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        decode_block(ci, my * c["vs"] + by, mx * c["hs"] + bx)
            nmcu += 1

    planes = []
    for ci, c in enumerate(comps):
        qt = qtables[c["tq"]]
        quant = store[ci].reshape(-1, 64)
        coef = np.zeros((len(quant), 64), dtype=np.float64)
        coef[:, _ZIGZAG] = quant
        coef = coef.reshape(-1, 8, 8) * qt
        pix = np.einsum("ji,njk,kl->nil", _C, coef, _C) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        rows, cols = mcuy * c["vs"], mcux * c["hs"]
        plane = (
            pix.reshape(rows, cols, 8, 8).transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        # crop to the component's true dims, then upsample to full res
        cw = (w * c["hs"] + hmax - 1) // hmax
        chh = (h * c["vs"] + vmax - 1) // vmax
        plane = plane[:chh, :cw]
        if c["hs"] != hmax or c["vs"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["vs"], axis=0),
                hmax // c["hs"], axis=1,
            )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    ycc = np.stack(planes, axis=-1)
    if color_space == "ycbcr":
        return ycc
    return ycbcr_to_rgb(ycc)


def np_decode_jpeg_gray(raw: bytes) -> np.ndarray:
    """Decode a baseline JPEG → HxW uint8 grayscale. Color streams
    return the full-resolution Y (luma) plane — the reference's OCR
    path grayscales immediately after decode (image_processor.py
    preprocessing), and Y IS the BT.601 luma."""
    out = np_decode_jpeg(raw, color_space="ycbcr")
    return out if out.ndim == 2 else out[..., 0]
