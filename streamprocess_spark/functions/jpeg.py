"""JPEG codec (SURVEY §2.1 S15), dependency-free NumPy — baseline
(SOF0) AND progressive (SOF2).

The reference accepts JPEG scans on the OCR path and decodes via
cv2.imdecode (src/workers/ocr_worker.py:283-308). No codec library is
present in this container, so this implements the DCT processes from
scratch (ITU-T T.81):

  decoder — 8-bit baseline and progressive, grayscale AND color:
    - marker walk (APPn/COM skip, fill bytes, DQT/DHT multi-table,
      SOF0/SOF2, multiple SOS, DRI/RSTn restart-interval support,
      EOI), with short-segment totality (every malformed stream raises
      ValueError so the ingest dead-letter boundary holds)
    - canonical Huffman reconstruction from BITS/HUFFVAL
    - entropy decode with 0xFF00 unstuffing, DC prediction,
      receive/extend, dequantize, dezigzag, float IDCT, level shift
    - 3-component YCbCr with any (h,v) sampling in {1,2} — 4:4:4,
      4:2:0, 4:2:2 — interleaved and non-interleaved scans,
      per-component DC predictors, chroma upsampling by replication,
      BT.601 YCbCr→RGB
    - the full T.81 Annex G progressive repertoire: multi-scan
      coefficient accumulation, spectral selection, successive
      approximation (DC and AC first + refinement passes), EOBRUN
    - extended-sequential/lossless/arithmetic processes and
      4-component (CMYK) streams rejected with documented
      NotImplementedError

  encoder — baseline grayscale and color with the T.81 Annex K
    luminance/chrominance quantization tables (libjpeg quality
    scaling) and Annex K standard Huffman tables; 4:4:4 and 4:2:0
    subsampling (2x2 box chroma downsample); plus progressive
    variants (np_encode_jpeg_gray_progressive / _ycbcr_progressive)
    emitting a 6+-scan spectral-selection + successive-approximation
    script with per-scan derived Huffman tables — the same quantized
    coefficients as baseline, so decode output is bit-identical and
    fixtures keep their closed-form oracles. Used by fixtures and the
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
# progressive encoder (T.81 Annex G) — fixtures for the SOF2 decoder
# ---------------------------------------------------------------------------


def _flat_table(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """A valid (suboptimal) Huffman table with every symbol at one
    length L chosen so n < 2^L — the all-ones codeword stays unused,
    as T.81 requires for padding safety."""
    vals = sorted(symbols)
    n = max(1, len(vals))
    length = 2
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    enc, _dec = _canonical_codes(bits, vals)
    return bits, vals, enc


class _ScanOps:
    """Token buffer for one scan: Huffman symbols + raw bit runs.
    Symbols are collected first so the scan's DHT can be derived,
    then the whole scan serializes through one _StuffWriter."""

    def __init__(self) -> None:
        self.ops: list[tuple[str, int, int]] = []
        self.symbols: set[int] = set()

    def sym(self, s: int) -> None:
        self.ops.append(("sym", s, 0))
        self.symbols.add(s)

    def bits(self, value: int, n: int) -> None:
        if n:
            self.ops.append(("bits", value, n))

    def serialize(self, enc: dict[int, tuple[int, int]]) -> bytes:
        bw = _StuffWriter()
        for kind, v, n in self.ops:
            if kind == "sym":
                code, ln = enc[v]
                bw.write(code, ln)
            else:
                bw.write(v, n)
        return bw.flush()


def _dc_first_ops(grids: list[np.ndarray], samps: list[tuple[int, int]],
                  al: int, mcux: int, mcuy: int) -> _ScanOps:
    """Interleaved DC first pass: diffs of (dc >> al), G.1.2.1."""
    ops = _ScanOps()
    preds = [0] * len(grids)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        v = int(grids[ci][my * vs + by, mx * hs + bx, 0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = abs(diff).bit_length()
                        ops.sym(s)
                        ops.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return ops


def _dc_refine_ops(grids: list[np.ndarray], samps: list[tuple[int, int]],
                   al: int, mcux: int, mcuy: int) -> _ScanOps:
    """Interleaved DC refinement: one raw magnitude bit per block."""
    ops = _ScanOps()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        v = int(grids[ci][my * vs + by, mx * hs + bx, 0])
                        ops.bits((v >> al) & 1, 1)
    return ops


def _ac_first_ops(grid: np.ndarray, ss: int, se: int, al: int) -> _ScanOps:
    """Single-component AC first pass with EOBRUN (G.1.2.2)."""
    ops = _ScanOps()
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            rr = eobrun.bit_length() - 1
            ops.sym(rr << 4)
            ops.bits(eobrun - (1 << rr), rr)
            eobrun = 0

    for blk in grid.reshape(-1, 64):
        band = blk[ss:se + 1]
        tvals = [int(v) >> al if v >= 0 else -((-int(v)) >> al)
                 for v in band]
        nz = [i for i, t in enumerate(tvals) if t != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        prev = -1
        for i in nz:
            run = i - prev - 1
            prev = i
            while run > 15:
                ops.sym(0xF0)                          # ZRL
                run -= 16
            t = tvals[i]
            s = abs(t).bit_length()
            ops.sym((run << 4) | s)
            ops.bits(t if t > 0 else t + (1 << s) - 1, s)
        if nz[-1] < se - ss:
            eobrun = 1                                 # this block's EOB
    flush()
    return ops


def _ac_refine_ops(grid: np.ndarray, ss: int, se: int, al: int) -> _ScanOps:
    """Single-component AC refinement (G.1.2.3): newly-significant
    coefficients as (run,1) symbols, correction bits for the already-
    significant ones buffered and emitted after the covering symbol."""
    ops = _ScanOps()
    ah = al + 1
    eobrun = 0
    be: list[int] = []                                 # bits pending w/ EOBn

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            rr = eobrun.bit_length() - 1
            ops.sym(rr << 4)
            ops.bits(eobrun - (1 << rr), rr)
            for b in be:
                ops.bits(b, 1)
            be.clear()
            eobrun = 0

    for blk in grid.reshape(-1, 64):
        band = [int(v) for v in blk[ss:se + 1]]
        run = 0
        br: list[int] = []                             # bits pending in-block
        for v in band:
            mag = abs(v)
            t = mag >> al
            if t == 0:
                run += 1
                continue
            if mag >> ah:                              # already significant
                br.append(t & 1)
                continue
            # newly significant: t must be 1 at this precision
            flush()
            while run > 15:
                ops.sym(0xF0)
                for b in br:
                    ops.bits(b, 1)
                br.clear()
                run -= 16
            ops.sym((run << 4) | 1)
            ops.bits(1 if v > 0 else 0, 1)             # sign
            for b in br:
                ops.bits(b, 1)
            br.clear()
            run = 0
        if run > 0 or br:                              # trailing → EOB run
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()
    return ops


def _emit_progressive(out: bytearray, grids: list[np.ndarray],
                      samps: list[tuple[int, int]],
                      mcux: int, mcuy: int) -> None:
    """Append the scan script: DC first (Al=1) → DC refine → per
    component AC 1..5 and 6..63 at Al=1 → their refinements. Every
    scan carries its own derived DHT."""
    ncomp = len(grids)
    ids = list(range(1, ncomp + 1))

    def sos(comp_tabs: list[tuple[int, int, int]],
            ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_tabs)])
        for cid, td, ta in comp_tabs:
            body += bytes([cid, (td << 4) | ta])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, Al=1, interleaved, DC table 0
    ops = _dc_first_ops(grids, samps, 1, mcux, mcuy)
    bits, vals, enc = _flat_table(ops.symbols)
    out += _seg(0xC4, b"\x00" + bytes(bits) + bytes(vals))
    out += sos([(i, 0, 0) for i in ids], 0, 0, 0, 1)
    out += ops.serialize(enc)
    # scan 2: DC refinement to Al=0 (no Huffman symbols)
    ops = _dc_refine_ops(grids, samps, 0, mcux, mcuy)
    out += sos([(i, 0, 0) for i in ids], 0, 0, 1, 0)
    out += ops.serialize({})
    # AC scans per component, two spectral bands, Al=1 then refine
    for band in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            for ah in (0, 1):                          # first, then refine
                fn = _ac_first_ops if ah == 0 else _ac_refine_ops
                ops = fn(grids[ci], band[0], band[1], 1 - ah)
                bits, vals, enc = _flat_table(ops.symbols)
                out += _seg(0xC4, b"\x10" + bytes(bits) + bytes(vals))
                out += sos([(ids[ci], 0, 0)], band[0], band[1],
                           ah, 1 - ah)
                out += ops.serialize(enc)


def np_encode_jpeg_gray_progressive(img: np.ndarray,
                                    quality: int = 50) -> bytes:
    """Progressive (SOF2) grayscale encoder: same quantized
    coefficients as np_encode_jpeg_gray, delivered through a 6-scan
    spectral-selection + successive-approximation script — so decode
    output is bit-identical to the baseline encoding's."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    qt = quality_qtable(quality)
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + qt.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes())
    sof = b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01" \
        + b"\x01\x11\x00"
    out += _seg(0xC2, sof)                             # SOF2
    grid = _quant_blocks(padded, qt).reshape(ph // 8, pw // 8, 64)
    _emit_progressive(out, [grid], [(1, 1)], pw // 8, ph // 8)
    out += b"\xFF\xD9"
    return bytes(out)


def np_encode_jpeg_ycbcr_progressive(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
    quality: int = 50, subsample: str = "420",
) -> bytes:
    """Progressive (SOF2) color encoder: the np_encode_jpeg_ycbcr
    pipeline (same quant tables, sampling, padding) with the
    progressive scan script — decode matches the baseline encoding
    bit-for-bit."""
    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if cb.shape != (h, w) or cr.shape != (h, w):
        raise ValueError("YCbCr planes must share dimensions")
    if subsample == "420":
        hs = vs = 2

        def down(p: np.ndarray) -> np.ndarray:
            ph2, pw2 = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            pp = np.pad(p, ((0, ph2 - h), (0, pw2 - w)),
                        mode="edge").astype(np.float64)
            return np.round(
                pp.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
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
           + bytes([1, (hs << 4) | vs, 0])
           + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    out += _seg(0xC2, sof)
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
        return _quant_blocks(plane, qt).reshape(
            plane.shape[0] // 8, plane.shape[1] // 8, 64
        )

    grids = [qb(yp, qt_l), qb(cbp, qt_c), qb(crp, qt_c)]
    _emit_progressive(out, grids, [(hs, vs), (1, 1), (1, 1)], mcux, mcuy)
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def np_decode_jpeg(raw: bytes, color_space: str = "rgb") -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG:
    1-component grayscale → HxW uint8; 3-component YCbCr (any sampling
    in {1,2}) → HxWx3 uint8 in `color_space` ("rgb" or "ycbcr").
    Multi-scan streams — non-interleaved baseline, and the full T.81
    Annex G progressive repertoire (spectral selection + successive
    approximation, DC/AC first and refinement passes, EOBRUN) — are
    decoded by accumulating coefficients across scans."""
    if raw[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[dict] = []        # id, hs, vs, tq per SOF component
    restart_interval = 0
    progressive = False
    store: list[np.ndarray] = []
    hmax = vmax = mcux = mcuy = 0
    n_scans = 0

    def run_scan(scan_cis: list[int], scan_tabs: list[tuple[int, int]],
                 ss: int, se: int, ah: int, al: int, at: int) -> int:
        """Entropy-decode one scan starting at file offset `at`;
        returns the offset of the marker that ended it."""
        rd = _StuffReader(raw, at)
        preds = [0] * len(comps)
        eobrun = 0

        def read_symbol(table: dict[tuple[int, int], int]) -> int:
            code = 0
            for length in range(1, 17):
                code = (code << 1) | rd.read_bit()
                sym = table.get((length, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code in JPEG scan")

        def first_pass(ci: int, blk: np.ndarray, si: int) -> None:
            """DC and/or AC first pass over band [ss..se] (Ah == 0).
            Baseline is the ss=0, se=63, al=0 special case."""
            nonlocal eobrun
            td, ta = scan_tabs[si]
            k = ss
            if ss == 0:
                s = read_symbol(huff[(0, td)])
                if s > 11:                              # T.81 F.1.2.1.1
                    raise ValueError(f"DC category {s} out of range")
                diff = _extend(rd.read(s), s) if s else 0
                preds[ci] += diff
                if abs(preds[ci]) > (1 << 15):
                    raise ValueError("DC coefficient out of range")
                blk[0] = preds[ci] << al
                k = 1
            if se == 0:
                return
            if eobrun > 0:                              # block inside EOB run
                eobrun -= 1
                return
            ac_dec = huff[(1, ta)]
            while k <= se:
                sym = read_symbol(ac_dec)
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run == 15:                       # ZRL
                        k += 16
                        continue
                    # EOBn: run of (1<<run)+bits blocks incl. this one
                    if run and not progressive:
                        raise ValueError("EOBn symbol in baseline scan")
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += rd.read(run)
                    break
                if size > 10:                           # T.81 F.1.2.2.1
                    raise ValueError(f"AC size {size} out of range")
                k += run
                if k > se:
                    raise ValueError("AC run past band end")
                blk[k] = _extend(rd.read(size), size) << al
                k += 1

        def refine_pass(ci: int, blk: np.ndarray, si: int) -> None:
            """Successive-approximation refinement (Ah = Al + 1),
            T.81 G.1.2.1 (DC) / G.1.2.3 (AC)."""
            nonlocal eobrun
            p1, m1 = 1 << al, -1 << al
            if ss == 0:
                if rd.read_bit():                       # two's-complement OR
                    blk[0] |= p1
                return
            _td, ta = scan_tabs[si]
            ac_dec = huff[(1, ta)]

            def correct(k: int) -> None:
                if rd.read_bit() and not (blk[k] & p1):
                    blk[k] += p1 if blk[k] >= 0 else m1

            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = read_symbol(ac_dec)
                    run, size = sym >> 4, sym & 0x0F
                    newval = 0
                    if size == 0:
                        if run != 15:                   # EOBn
                            eobrun = (1 << run)
                            if run:
                                eobrun += rd.read(run)
                            break
                        # ZRL: pass 16 zero-history coefficients
                    else:
                        if size != 1:
                            raise ValueError(
                                "AC refinement size must be 1"
                            )
                        newval = p1 if rd.read_bit() else m1
                    while k <= se:                      # advance over run
                        if blk[k] != 0:
                            correct(k)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if newval and k <= se:
                        blk[k] = newval
                    k += 1
            if eobrun > 0:                              # EOB-run correction
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    k += 1
                eobrun -= 1

        decode = refine_pass if ah else first_pass

        nunit = 0

        def maybe_restart() -> None:
            nonlocal nunit, eobrun
            if restart_interval and nunit and nunit % restart_interval == 0:
                rd.sync_restart()
                preds[:] = [0] * len(preds)
                eobrun = 0
            nunit += 1

        if len(scan_cis) > 1:                           # interleaved: MCUs
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for si, ci in enumerate(scan_cis):
                        c = comps[ci]
                        for by in range(c["vs"]):
                            for bx in range(c["hs"]):
                                decode(ci,
                                       store[ci][my * c["vs"] + by,
                                                 mx * c["hs"] + bx], si)
        else:                                           # single component
            ci = scan_cis[0]
            c = comps[ci]
            bw_ = (w * c["hs"] + 8 * hmax - 1) // (8 * hmax)
            bh_ = (h * c["vs"] + 8 * vmax - 1) // (8 * vmax)
            for by in range(bh_):
                for bx in range(bw_):
                    maybe_restart()
                    decode(ci, store[ci][by, bx], 0)
        return rd.end_pos

    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = raw[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0xFF:                              # fill byte (B.1.1.2)
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:    # standalone
            pos += 2
            continue
        if pos + 4 > len(raw):
            raise ValueError("truncated JPEG segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0 / SOF1(8-bit) / SOF2
            if h is not None:
                raise ValueError("multiple SOF markers")
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("short SOF segment")
            if body[0] != 8:
                # SOF1 permits 12-bit precision; only 8-bit decodes
                # here (12-bit needs 16-bit DQT + wider ranges)
                raise NotImplementedError(
                    f"JPEG sample precision {body[0]} (8-bit only)"
                )
            hgt = int.from_bytes(body[1:3], "big")
            wid = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG (CMYK/unknown); gray + YCbCr only"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("short SOF segment")
            h, w = hgt, wid
            if not (1 <= h <= 20000 and 1 <= w <= 20000):
                raise ValueError(f"JPEG dims {w}x{h} out of sane range")
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
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            store = [
                np.zeros((mcuy * c["vs"], mcux * c["hs"], 64),
                         dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process 0x{marker:02x} (SOF0 baseline, SOF1 "
                "8-bit extended, SOF2 progressive only)"
            )
        elif marker == 0xDD:                            # DRI
            if len(body) < 2:
                raise ValueError("short DRI segment")
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:                            # SOS
            if h is None:
                raise ValueError("SOS before SOF")
            if len(body) < 4:
                raise ValueError("short SOS segment")
            ns = body[0]
            if not 1 <= ns <= len(comps) or len(body) < 1 + 2 * ns + 3:
                raise ValueError("short SOS segment")
            ids = {c["id"]: i for i, c in enumerate(comps)}
            scan_cis: list[int] = []
            scan_tabs: list[tuple[int, int]] = []
            for k in range(ns):
                cid = body[1 + 2 * k]
                if cid not in ids:
                    raise ValueError("SOS references unknown component")
                tt = body[2 + 2 * k]
                scan_cis.append(ids[cid])
                scan_tabs.append((tt >> 4, tt & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            aa = body[3 + 2 * ns]
            ah, al = aa >> 4, aa & 0x0F
            if progressive:
                if not (ss <= se <= 63 and (ss == 0) == (se == 0)):
                    raise ValueError(f"bad progressive band {ss}..{se}")
                if ss > 0 and ns != 1:
                    raise ValueError("interleaved progressive AC scan")
                if ah and ah != al + 1:
                    raise ValueError("bad successive approximation Ah/Al")
            else:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("bad baseline SOS parameters")
            for si, ci in enumerate(scan_cis):
                td, ta = scan_tabs[si]
                if ss == 0 and ah == 0 and (0, td) not in huff:
                    raise ValueError("JPEG missing DC Huffman table")
                if se > 0 and (1, ta) not in huff:
                    raise ValueError("JPEG missing AC Huffman table")
            pos = run_scan(scan_cis, scan_tabs, ss, se, ah, al,
                           pos + 2 + ln)
            n_scans += 1
            continue
        pos += 2 + ln
    if h is None or n_scans == 0:
        raise ValueError("JPEG missing SOF/SOS")
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"JPEG missing quant table {c['tq']}")

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


# ---------------------------------------------------------------------------
# EXIF APP1 orientation (F11 first branch, image_processor.py:81-98:
# the reference reads PIL _getexif() tag 274 before its content-based
# angle search). The APP1 payload is a TIFF file (Exif 2.3 / CIPA
# DC-008): 6-byte "Exif\0\0" header, then a TIFF header (byte order
# II/MM + magic 42 + IFD0 offset) and IFD0's 12-byte tag entries.
# ---------------------------------------------------------------------------

_EXIF_TAG_ORIENTATION = 274  # 0x0112


def np_exif_app1(orientation: int, byte_order: str = "II") -> bytes:
    """Build a minimal APP1 Exif segment whose IFD0 carries only the
    orientation tag. `byte_order` II (little) or MM (big) — both are
    legal on the wire and the reader must accept both."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    end = "little" if byte_order == "II" else "big"
    tiff = bytearray(byte_order.encode())
    tiff += (42).to_bytes(2, end)
    tiff += (8).to_bytes(4, end)          # IFD0 right after the header
    tiff += (1).to_bytes(2, end)          # one entry
    tiff += _EXIF_TAG_ORIENTATION.to_bytes(2, end)
    tiff += (3).to_bytes(2, end)          # type SHORT
    tiff += (1).to_bytes(4, end)          # count
    # SHORT value packed into the first 2 bytes of the 4-byte slot
    tiff += orientation.to_bytes(2, end) + b"\x00\x00"
    tiff += (0).to_bytes(4, end)          # no next IFD
    return _seg(0xE1, b"Exif\x00\x00" + bytes(tiff))


def np_encode_jpeg_gray_exif(
    img: np.ndarray, orientation: int,
    quality: int = 50, byte_order: str = "II",
) -> bytes:
    """Baseline grayscale JPEG with an EXIF orientation tag: the APP1
    segment is inserted directly after SOI (before JFIF APP0 — Exif
    writers put APP1 first; readers must not care)."""
    plain = np_encode_jpeg_gray(img, quality=quality)
    return plain[:2] + np_exif_app1(orientation, byte_order) + plain[2:]


def np_jpeg_exif_orientation(raw: bytes) -> int:
    """Walk the JPEG markers for an APP1 Exif segment and return the
    IFD0 orientation (1..8). Returns 1 (normal) when no EXIF / no
    orientation tag is present — the reference's `exif.get(274)` falsy
    path. Malformed TIFF payloads also return 1 rather than raising:
    orientation is advisory metadata, not part of the decodable image,
    so a broken tag must not dead-letter an otherwise-valid scan
    (mirrors the reference's bare `except: pass` around its EXIF
    branch)."""
    if len(raw) < 4 or raw[0] != 0xFF or raw[1] != 0xD8:
        return 1
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            break
        marker = raw[pos + 1]
        if marker == 0xFF:                 # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):         # entropy data / EOI: no EXIF past here
            break
        seg_len = int.from_bytes(raw[pos + 2:pos + 4], "big")
        body = raw[pos + 4:pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return _parse_tiff_orientation(body[6:])
        pos += 2 + seg_len
    return 1


def _parse_tiff_orientation(tiff: bytes) -> int:
    try:
        order = tiff[:2]
        if order == b"II":
            end = "little"
        elif order == b"MM":
            end = "big"
        else:
            return 1
        if int.from_bytes(tiff[2:4], end) != 42:
            return 1
        ifd = int.from_bytes(tiff[4:8], end)
        n = int.from_bytes(tiff[ifd:ifd + 2], end)
        for i in range(n):
            e = ifd + 2 + 12 * i
            tag = int.from_bytes(tiff[e:e + 2], end)
            if tag != _EXIF_TAG_ORIENTATION:
                continue
            typ = int.from_bytes(tiff[e + 2:e + 4], end)
            if typ not in (3, 4):          # SHORT or LONG
                return 1
            width = 2 if typ == 3 else 4
            v = int.from_bytes(tiff[e + 8:e + 8 + width], end)
            return v if 1 <= v <= 8 else 1
        return 1
    except (IndexError, ValueError):
        return 1
