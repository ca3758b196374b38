"""Image scalar-function library (SURVEY §2.10 F11-F23).

Image model: opaque binary column = raw 8-bit grayscale bytes in
row-major order, with width/height carried as typed metadata columns
(FIXTURES.md document_jobs). The container has no OpenCV/PIL, so:
  - Container codecs implemented from scratch: PNG (stdlib zlib, all
    5 scanline filters, 8/16-bit, Adam7 interlace), BMP, TIFF (both
    byte orders, Compression none/LZW/PackBits, multi-strip),
    baseline JPEG incl. YCbCr color (functions/jpeg.py), PDF image
    extraction (functions/pdf.py). Formats needing codec libs absent
    here (WEBP, JPEG-in-TIFF, …) raise NotImplementedError.
  - Geometry/threshold/crop/layout ops are real NumPy implementations
    mirroring src/preprocessing/image_processor.py semantics.

Mapping (reference file:line in image_processor.py):
  F13 denoise        (:182-196)  np_nlmeans: real non-local means at
                                 the reference's h=10/7/21 parameters
                                 (cv2.fastNlMeansDenoising algorithm;
                                 np_median3 kept for the hashed
                                 median-chain oracle legs)
  F14 enhance        (:198-215)  np_clahe: cv2-construction CLAHE
                                 (clipLimit=2, 8x8 tiles, bilinear
                                 LUT blend) + gamma 1.2 LUT
                                 (np_enhance_contrast percentile
                                 stretch kept for the closed-form
                                 q67 oracle invariants)
  F15 binarize       (:217-236)  otsu | adaptive-mean | fixed
  F16 remove_noise   (:238-262)  morphological open (3x3)
  F17 adjust_dpi     (:264-286)  nearest-neighbor rescale
  F18 detect_layout  (:288-335)  projection-profile blocks, sorted y,x
  F19 detect_tables  (:337-369)  long-run line mask → bboxes
  F20 crop_to_content(:371-398)  non-white bbox + padding
  F22 validate_image (:422-446)  min/max size + blank-ratio check
  F23 bbox from quad (ocr_worker.py:373-379) min/max of corner points
  F11 auto_rotate    (:81-141)   EXIF tag-274 quarter-turn (parsed by
                                 jpeg.np_jpeg_exif_orientation, applied
                                 via np_apply_exif_orientation) then
                                 projection-profile angle search
                                 (Hough-vote analog) + NN rotation
  F12 deskew         (:143-180)  dark-pixel PCA angle (minAreaRect
                                 analog) + NN rotation
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

WHITE = 230  # "non-white" threshold for content detection


# ---------------------------------------------------------------------------
# decode layer
# ---------------------------------------------------------------------------

def decode_image(raw: bytes, width: int, height: int, fmt: str = "GRAY8") -> np.ndarray:
    """Decode an image payload to a HxW uint8 grayscale array.

    GRAY8 (raw raster), PNG (stdlib-zlib decoder below), BMP, baseline
    JPEG (functions/jpeg.py), and uncompressed TIFF are implemented
    from scratch; remaining formats from the reference's accepted list
    (src/grpc_server/server.py:354) raise NotImplementedError."""
    if fmt == "PNG":
        img = np_decode_png(raw)
        img = np_png_to_gray(img)
        if img.shape != (height, width):
            raise ValueError(
                f"PNG dims {img.shape[::-1]} != metadata {width}x{height}"
            )
        return img
    if fmt == "BMP":
        img = np_decode_bmp(raw)
        if img.shape != (height, width):
            raise ValueError(
                f"BMP dims {img.shape[::-1]} != metadata {width}x{height}"
            )
        return img
    if fmt == "JPEG":
        from streamprocess_spark.functions.jpeg import np_decode_jpeg_gray

        img = np_decode_jpeg_gray(raw)
        if img.shape != (height, width):
            raise ValueError(
                f"JPEG dims {img.shape[::-1]} != metadata {width}x{height}"
            )
        return img
    if fmt == "TIFF":
        img = np_decode_tiff_gray(raw)
        if img.shape != (height, width):
            raise ValueError(
                f"TIFF dims {img.shape[::-1]} != metadata {width}x{height}"
            )
        return img
    if fmt == "PNM":
        img = np_png_to_gray(np_decode_pnm(raw))
        if img.shape != (height, width):
            raise ValueError(
                f"PNM dims {img.shape[::-1]} != metadata {width}x{height}"
            )
        return img
    if fmt == "GIF":
        from streamprocess_spark.functions.gif import np_decode_gif

        frames, _screen = np_decode_gif(raw)
        img = np_png_to_gray(frames[0])        # first frame, 601 luma
        if img.shape != (height, width):
            raise ValueError(
                f"GIF dims {img.shape[::-1]} != metadata {width}x{height}"
            )
        return img
    if fmt != "GRAY8":
        raise NotImplementedError(
            f"decode for {fmt} needs an image codec (PIL/OpenCV); the "
            "reference decodes via cv2.imdecode (ocr_worker.py:283-308)"
        )
    arr = np.frombuffer(raw, dtype=np.uint8)
    if len(arr) != width * height:
        raise ValueError(f"payload {len(arr)} != {width}x{height}")
    return arr.reshape(height, width)


# ---------------------------------------------------------------------------
# PNG codec (S15) — stdlib zlib + NumPy, no PIL/OpenCV
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (gray, RGB, gray+alpha, RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


# Adam7 interlace pass geometry: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def np_encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal PNG writer: 8- or 16-bit samples, filter 0 per
    scanline, optional Adam7 interlace. 2-D array → grayscale (color
    type 0); HxWx3 → RGB (color type 2). Produces standard PNGs any
    external reader accepts — the inverse of the reference's
    cv2.imencode boundary."""
    import struct
    import zlib as _z

    if img.dtype == np.uint8:
        depth = 8
    elif img.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError("np_encode_png expects uint8/uint16")
    if img.ndim == 2:
        color_type, arr = 0, img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, arr = 2, img
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w, _c = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)

    def rows_bytes(a: np.ndarray) -> bytes:
        # (ph, pw, c) → filter-0 scanlines (16-bit samples big-endian)
        ph = a.shape[0]
        if depth == 16:
            flat = a.astype(">u2").reshape(ph, -1).view(np.uint8)
        else:
            flat = a.reshape(ph, -1)
        return np.concatenate(
            [np.zeros((ph, 1), dtype=np.uint8), flat], axis=1
        ).tobytes()

    if not interlace:
        raw = rows_bytes(arr)
    else:
        raw = b"".join(
            rows_bytes(arr[y0::dy, x0::dx])
            for (x0, y0, dx, dy) in _ADAM7
            if arr[y0::dy, x0::dx].size
        )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def np_encode_png_indexed(idx: np.ndarray, palette: np.ndarray,
                          depth: int = 8) -> bytes:
    """Indexed-color PNG writer (color type 3) for fixtures: HxW index
    array + (N,3) RGB palette, bit depths 1/2/4/8 (MSB-first packed
    rows, byte-padded per scanline, filter 0)."""
    import struct
    import zlib as _z

    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("need 2-D indices and (N,3) palette")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"bad palette depth {depth}")
    if int(idx.max(initial=0)) >= min(len(palette), 1 << depth):
        raise ValueError("index exceeds palette/depth range")
    h, w = idx.shape
    if depth == 8:
        rows = idx
    else:
        bits = ((idx[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1) \
            .reshape(h, w * depth).astype(np.uint8)
        rows = np.packbits(bits, axis=1)       # MSB-first, row-padded
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rows], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", _z.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter_row(ftype: int, cur: np.ndarray, prev: np.ndarray,
                      bpp: int) -> np.ndarray:
    """Reverse one scanline filter (PNG spec §6). uint8 arithmetic
    wraps mod 256 exactly as the spec requires."""
    if ftype == 0:                                    # None
        return cur
    if ftype == 2:                                    # Up (vectorized)
        return cur + prev
    if ftype == 1:                                    # Sub: per-lane cumsum
        out = cur.copy()
        for lane in range(bpp):
            np.add.accumulate(out[lane::bpp], out=out[lane::bpp])
        return out
    out = np.empty_like(cur)
    if ftype == 3:                                    # Average
        for i in range(len(cur)):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return out
    if ftype == 4:                                    # Paeth
        for i in range(len(cur)):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(cur[i]) + pred) & 0xFF
        return out
    raise ValueError(f"bad PNG filter type {ftype}")


def np_decode_png(raw: bytes) -> np.ndarray:
    """PNG reader: color types gray/RGB/gray+alpha/RGBA at 8/16-bit
    (plus 1/2/4-bit gray) and paletted (type 3, PLTE, depths 1/2/4/8
    → expanded to RGB), non-interlaced and Adam7, all five scanline
    filters (which operate on BYTES with bpp = max(1, bits-per-pixel
    // 8), PNG spec §9 — so one unfilter path serves every depth).
    Returns (H, W) for grayscale or (H, W, C) otherwise; uint16 for
    16-bit samples."""
    import struct
    import zlib as _z

    if len(raw) < 8 or raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(raw):
        (size,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            if size % 3 or size == 0 or size > 768:
                raise ValueError("PNG PLTE size not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size  # len + tag + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if color_type == 3:                        # paletted
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"bad paletted PNG depth {depth}")
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        ch = 1
    elif color_type in _PNG_CHANNELS:
        ch = _PNG_CHANNELS[color_type]
        if not (depth in (8, 16) or (color_type == 0 and depth in (1, 2, 4))):
            raise NotImplementedError(
                f"PNG depth {depth} for color type {color_type}"
            )
    else:
        raise NotImplementedError(f"PNG color type {color_type}")
    bits_pp = ch * depth                       # bits per pixel
    bpp = max(1, bits_pp // 8)                 # filter unit in BYTES (§9)
    data = np.frombuffer(_z.decompress(b"".join(idat)), dtype=np.uint8)

    def row_bytes(pw: int) -> int:
        return (pw * bits_pp + 7) // 8

    def unfilter_block(block: np.ndarray, ph: int, pw: int) -> np.ndarray:
        stride = row_bytes(pw)
        rows = block.reshape(ph, stride + 1)
        out = np.empty((ph, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for r in range(ph):
            prev = _png_unfilter_row(int(rows[r, 0]), rows[r, 1:], prev, bpp)
            out[r] = prev
        return out

    def to_pixels(b: np.ndarray, ph: int, pw: int) -> np.ndarray:
        if depth == 16:                        # network byte order
            return (b.reshape(ph, pw * ch * 2).view(">u2")
                    .astype(np.uint16).reshape(ph, pw, ch))
        if depth == 8:
            return b.reshape(ph, pw, ch)
        # sub-byte samples: MSB-first bit groups, row-padded to bytes
        bits = np.unpackbits(b.reshape(ph, row_bytes(pw)), axis=1)
        grp = bits[:, :pw * depth].reshape(ph, pw, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        return (grp * weights).sum(axis=2, dtype=np.uint16) \
            .astype(np.uint8)[:, :, None]

    dtype = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        if len(data) != h * (row_bytes(w) + 1):
            raise ValueError("PNG pixel data size mismatch")
        out = to_pixels(unfilter_block(data, h, w), h, w)
    elif interlace == 1:                       # Adam7: 7 sub-images
        out = np.zeros((h, w, ch), dtype=dtype)
        at = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            need = ph * (row_bytes(pw) + 1)
            if at + need > len(data):
                raise ValueError("PNG interlaced data truncated")
            out[y0::dy, x0::dx] = to_pixels(
                unfilter_block(data[at:at + need], ph, pw), ph, pw
            )
            at += need
        if at != len(data):
            raise ValueError("PNG pixel data size mismatch")
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color_type == 3:                        # palette lookup → RGB
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]
    if color_type == 0 and depth < 8:          # scale gray to 8-bit
        out = (out.astype(np.uint16) * (255 // ((1 << depth) - 1))) \
            .astype(np.uint8)
    return out.reshape(h, w) if ch == 1 else out


def np_encode_pnm(img: np.ndarray) -> bytes:
    """Binary netpbm writer: 2-D uint8 → P5 graymap, HxWx3 → P6
    pixmap (the interchange format OCR toolchains consume)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def np_decode_pnm(raw: bytes) -> np.ndarray:
    """Netpbm reader: P5/P6 binary and P2/P3 ASCII, '#' comments,
    maxval up to 65535 (binary 16-bit samples are big-endian per
    spec; >255 maxvals scale to 8-bit by round(v*255/maxval)).
    Returns (H, W) gray or (H, W, 3) RGB uint8."""
    if len(raw) < 2 or raw[0:1] != b"P" or raw[1:2] not in b"2356":
        raise ValueError("not a PGM/PPM (bad magic)")
    kind = raw[1:2]
    pos = 2
    fields: list[int] = []

    def next_token() -> int:
        nonlocal pos
        while pos < len(raw):
            c = raw[pos:pos + 1]
            if c == b"#":                      # comment to end of line
                while pos < len(raw) and raw[pos:pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        tok = raw[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad PNM header token {tok!r}")
        return int(tok)

    w, h, maxval = next_token(), next_token(), next_token()
    if not (1 <= w <= 20000 and 1 <= h <= 20000 and 1 <= maxval <= 65535):
        raise ValueError(f"PNM header out of range: {w}x{h} max {maxval}")
    ch = 3 if kind in (b"3", b"6") else 1
    n = w * h * ch
    if kind in (b"5", b"6"):                   # binary: ONE whitespace byte
        pos += 1
        if maxval > 255:
            need = 2 * n
            if len(raw) - pos < need:
                raise ValueError("PNM binary data truncated")
            vals = np.frombuffer(raw, dtype=">u2", count=n, offset=pos)
        else:
            if len(raw) - pos < n:
                raise ValueError("PNM binary data truncated")
            vals = np.frombuffer(raw, dtype=np.uint8, count=n, offset=pos)
    else:                                      # ASCII samples
        vals = np.empty(n, dtype=np.uint32)
        for i in range(n):
            vals[i] = next_token()
    if int(vals.max(initial=0)) > maxval:
        raise ValueError("PNM sample exceeds declared maxval")
    if maxval != 255:
        vals = np.rint(vals.astype(np.float64) * (255.0 / maxval))
    out = vals.astype(np.uint8)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def np_encode_bmp(img: np.ndarray) -> bytes:
    """Minimal BMP writer: 8-bit grayscale via a 256-entry gray
    palette (BI_RGB uncompressed, bottom-up rows, 4-byte row padding).
    The other uncompressed container the reference accepts
    (src/grpc_server/server.py:354)."""
    import struct

    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("np_encode_bmp expects 2-D uint8")
    h, w = img.shape
    row = (w + 3) & ~3                       # rows padded to 4 bytes
    palette = b"".join(bytes([v, v, v, 0]) for v in range(256))
    pix_off = 14 + 40 + len(palette)
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, :w] = img[::-1]                  # bottom-up
    header = struct.pack("<2sIHHI", b"BM", pix_off + h * row, 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, h * row, 2835, 2835, 256, 0)
    return header + dib + palette + body.tobytes()


def np_decode_bmp(raw: bytes) -> np.ndarray:
    """Minimal BMP reader: BI_RGB uncompressed 8-bit paletted or
    24-bit BGR, bottom-up or top-down, BITMAPINFOHEADER. Returns HxW
    uint8 grayscale (palette mapped / BGR luma)."""
    import struct

    if len(raw) < 54 or raw[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (pix_off,) = struct.unpack_from("<I", raw, 10)
    (hdr_size, w, h_signed, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", raw, 14
    )
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} (only BI_RGB)")
    if bpp not in (8, 24):
        raise NotImplementedError(f"BMP bit depth {bpp} (only 8/24)")
    h = abs(h_signed)
    bottom_up = h_signed > 0
    bypp = bpp // 8
    row = (w * bypp + 3) & ~3
    if len(raw) < pix_off + h * row:
        raise ValueError("BMP pixel data truncated")
    body = np.frombuffer(raw, dtype=np.uint8, count=h * row, offset=pix_off)
    body = body.reshape(h, row)
    if bottom_up:
        body = body[::-1]
    if bpp == 8:
        idx = body[:, :w]
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            raw, dtype=np.uint8, count=256 * 4, offset=pal_off
        ).reshape(256, 4)
        # palette entries are BGRx; gray palette → any channel works,
        # arbitrary palettes → luma of the mapped color
        bgr = pal[idx.reshape(-1)].reshape(h, w, 4).astype(np.float64)
    else:
        bgr = body[:, : w * 3].reshape(h, w, 3).astype(np.float64)
    gray = 0.114 * bgr[..., 0] + 0.587 * bgr[..., 1] + 0.299 * bgr[..., 2]
    return np.clip(np.rint(gray), 0, 255).astype(np.uint8)


def np_png_to_gray(img: np.ndarray) -> np.ndarray:
    """Collapse a decoded PNG to 8-bit grayscale: ITU-R 601 luma for
    RGB(A) (cv2.cvtColor BGR2GRAY uses the same weights, ocr_worker.py
    preprocessing path), alpha dropped; 16-bit samples scaled to 8-bit
    by round(v/257) so 0→0 and 65535→255 exactly."""
    if img.dtype == np.uint16:
        img = np.rint(img / 257.0).astype(np.uint8)
    if img.ndim == 2:
        return img
    c = img.shape[2]
    if c == 2:                                        # gray + alpha
        return img[:, :, 0]
    rgb = img[:, :, :3].astype(np.float64)
    return np.clip(
        np.rint(0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]),
        0, 255,
    ).astype(np.uint8)


def fake_decode(seed: str, width: int, height: int,
                n_blocks: int = 3) -> np.ndarray:
    """Deterministic procedural 'document': white page with dark text
    blocks placed by an md5-seeded PRNG — the conftest-style fixture
    (reference tests use a white 800x600 page + black rectangles,
    tests/conftest.py:96-104, test_preprocessing.py:236-252)."""
    h = hashlib.md5(seed.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    img = np.full((height, width), 255, dtype=np.uint8)
    for _ in range(n_blocks):
        bw = int(rng.integers(width // 8, width // 3))
        bh = int(rng.integers(height // 16, height // 8))
        x = int(rng.integers(0, max(1, width - bw)))
        y = int(rng.integers(0, max(1, height - bh)))
        img[y: y + bh, x: x + bw] = int(rng.integers(0, 80))
    return img


def np_rotate(img: np.ndarray, angle_deg: float, fill: int = 255) -> np.ndarray:
    """Nearest-neighbor rotation about the image center (the
    warpAffine analog, image_processor.py:172-178), white fill."""
    if abs(angle_deg) < 1e-9:
        return img.copy()
    h, w = img.shape
    th = np.deg2rad(angle_deg)
    c, s = np.cos(th), np.sin(th)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # inverse mapping: output pixel ← source pixel
    xs = c * (xx - cx) + s * (yy - cy) + cx
    ys = -s * (xx - cx) + c * (yy - cy) + cy
    xi = np.rint(xs).astype(np.int64)
    yi = np.rint(ys).astype(np.int64)
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.full((h, w), fill, dtype=img.dtype)
    out[ok] = img[yi[ok], xi[ok]]
    return out


def np_text_angle_pca(img: np.ndarray, dark: int = 128) -> float:
    """F12 angle estimate — pure-NumPy analog of
    cv2.minAreaRect(dark-pixel coords) (image_processor.py:152-160):
    the principal axis of the dark-pixel point cloud, mapped to
    (-45, 45] degrees. For text pages the principal axis follows the
    text lines, so the angle IS the skew."""
    ys, xs = np.nonzero(img < dark)
    if len(xs) < 2:
        return 0.0
    x = xs - xs.mean()
    y = ys - ys.mean()
    cov_xx = float(np.dot(x, x))
    cov_yy = float(np.dot(y, y))
    cov_xy = float(np.dot(x, y))
    angle = 0.5 * np.arctan2(2.0 * cov_xy, cov_xx - cov_yy)
    deg = float(np.rad2deg(angle))
    # principal axis is undirected: fold into (-45, 45]
    while deg <= -45.0:
        deg += 90.0
    while deg > 45.0:
        deg -= 90.0
    return deg


def deskew(img: np.ndarray, dark: int = 128) -> tuple[np.ndarray, float]:
    """F12 deskew (image_processor.py:143-180): estimate the text
    angle (PCA analog of minAreaRect) and rotate it out. Returns
    (corrected image, estimated angle in degrees)."""
    est = np_text_angle_pca(img, dark)
    return np_rotate(img, -est), est


def np_profile_sharpness(img: np.ndarray, dark: int = 128) -> float:
    """Variance of the horizontal projection profile — maximal when
    text lines are axis-aligned (the classic skew criterion standing
    in for the Hough-line vote histogram)."""
    rows = (img < dark).sum(axis=1).astype(np.float64)
    return float(rows.var())


def np_apply_exif_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """F11 EXIF branch (image_processor.py:83-95): the reference maps
    tag-274 value 3 → rotate(180), 6 → rotate(-90, expand) [clockwise],
    8 → rotate(90, expand) [counter-clockwise], and leaves every other
    value — including the mirrored orientations 2/4/5/7 — untouched.
    Mirrored exactly here: np.rot90(k) is CCW, so 6 → k=3, 8 → k=1.
    Pure views/copies, no resampling: pixel multisets (and therefore
    closed-form pixel sums) survive bit-exactly."""
    if orientation == 3:
        return np.rot90(img, 2)
    if orientation == 6:
        return np.rot90(img, 3)
    if orientation == 8:
        return np.rot90(img, 1)
    return img


def exif_orientation_inverse(orientation: int) -> int:
    """The tag value that undoes `orientation` under the reference's
    3/6/8 mapping (3 is self-inverse; 6 and 8 invert each other)."""
    return {3: 3, 6: 8, 8: 6}.get(orientation, 1)


def auto_rotate(
    img: np.ndarray,
    max_angle: float = 15.0,
    step: float = 0.5,
    dark: int = 128,
    exif_orientation: int = 1,
) -> tuple[np.ndarray, float]:
    """F11 text-angle correction (image_processor.py:81-141): first
    apply the EXIF orientation when the caller decoded one from the
    container (np_jpeg_exif_orientation; raw grayscale defaults to 1 =
    no-op), then search candidate angles and keep the rotation that
    maximizes projection-profile sharpness (deterministic grid argmax
    ≈ the dominant Hough-line angle) — the reference's exact two-step
    order. Returns (corrected image, applied fine angle in degrees);
    the coarse EXIF quarter-turn is not folded into the angle, same as
    the reference which discards it after rotating."""
    img = np_apply_exif_orientation(img, exif_orientation)
    best_angle, best_score = 0.0, -1.0
    n = int(round(2 * max_angle / step)) + 1
    for k in range(n):
        a = -max_angle + k * step
        score = np_profile_sharpness(np_rotate(img, a), dark)
        if score > best_score + 1e-9:
            best_angle, best_score = a, score
    return np_rotate(img, best_angle), best_angle


# ---------------------------------------------------------------------------
# real numpy implementations
# ---------------------------------------------------------------------------

def np_median3(img: np.ndarray) -> np.ndarray:
    """F13: 3x3 median denoise."""
    if img.shape[0] < 3 or img.shape[1] < 3:
        return img
    stacked = np.stack([
        img[i: img.shape[0] - 2 + i, j: img.shape[1] - 2 + j]
        for i in range(3) for j in range(3)
    ])
    out = img.copy()
    out[1:-1, 1:-1] = np.median(stacked, axis=0).astype(np.uint8)
    return out


def np_enhance_contrast(img: np.ndarray, gamma: float = 1.2) -> np.ndarray:
    """F14: percentile contrast stretch + gamma LUT."""
    lo, hi = np.percentile(img, [2, 98])
    if hi <= lo:
        return img
    stretched = np.clip((img.astype(np.float64) - lo) / (hi - lo), 0, 1)
    lut = np.power(stretched, 1.0 / gamma)
    return (lut * 255).astype(np.uint8)


def np_clahe(img: np.ndarray, clip_limit: float = 2.0,
             grid: tuple[int, int] = (8, 8)) -> np.ndarray:
    """F14 parity kernel: Contrast-Limited Adaptive Histogram
    Equalization, the cv2.createCLAHE(clipLimit=2.0, tileGridSize=
    (8,8)).apply construction the reference's enhance_contrast uses
    (image_processor.py:198-215): per-tile clipped histograms with
    excess redistribution, per-tile equalization LUTs, and bilinear
    interpolation between the four neighboring tile LUTs per pixel
    (Zuiderveld 1994 / the OpenCV algorithm; pure NumPy)."""
    h, w = img.shape
    gh, gw = grid
    th, tw = (h + gh - 1) // gh, (w + gw - 1) // gw
    ph, pw = th * gh - h, tw * gw - w
    # np.pad mode='reflect' is edge-EXCLUSIVE ([1,2,3] -> [1,2,3,2,1]),
    # i.e. exactly cv2's BORDER_REFLECT_101, which is what OpenCV's
    # CLAHE uses for the pad-to-tile-multiple copyMakeBorder
    padded = (
        np.pad(img, ((0, ph), (0, pw)), mode="reflect")
        if (ph or pw) else img
    )
    tile_area = th * tw
    limit = max(1, int(clip_limit * tile_area / 256.0))
    tiles = padded.reshape(gh, th, gw, tw)
    luts = np.empty((gh, gw, 256), dtype=np.uint8)
    lut_scale = 255.0 / tile_area
    for i in range(gh):
        for j in range(gw):
            hist = np.bincount(tiles[i, :, j, :].reshape(-1), minlength=256)
            excess = int(np.sum(np.maximum(hist - limit, 0)))
            if excess:
                hist = np.minimum(hist, limit)
                hist += excess // 256
                resid = excess % 256
                if resid:
                    # residual spread at even stride (the OpenCV pass)
                    step = max(1, 256 // resid)
                    hist[np.arange(0, 256, step)[:resid]] += 1
            cdf = np.cumsum(hist)
            luts[i, j] = np.clip(
                np.rint(cdf * lut_scale), 0, 255
            ).astype(np.uint8)

    # bilinear blend between tile LUTs, in tile-center coordinates
    ys = (np.arange(h) + 0.5) / th - 0.5
    xs = (np.arange(w) + 0.5) / tw - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    wy = (ys - y0f)[:, None]
    wx = (xs - x0f)[None, :]
    y0 = np.clip(y0f.astype(np.int64), 0, gh - 1)
    y1 = np.clip(y0f.astype(np.int64) + 1, 0, gh - 1)
    x0 = np.clip(x0f.astype(np.int64), 0, gw - 1)
    x1 = np.clip(x0f.astype(np.int64) + 1, 0, gw - 1)
    v = img
    out = (
        (1 - wy) * (1 - wx) * luts[y0[:, None], x0[None, :], v]
        + (1 - wy) * wx * luts[y0[:, None], x1[None, :], v]
        + wy * (1 - wx) * luts[y1[:, None], x0[None, :], v]
        + wy * wx * luts[y1[:, None], x1[None, :], v]
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _box_sum_valid(x: np.ndarray, k: int) -> np.ndarray:
    """Valid-mode sum over k x k windows via an integral image —
    output is (H-k+1, W-k+1) for input (H, W), O(1) per pixel."""
    ii = np.zeros((x.shape[0] + 1, x.shape[1] + 1))
    ii[1:, 1:] = np.cumsum(np.cumsum(x, axis=0), axis=1)
    h = x.shape[0] - k + 1
    w = x.shape[1] - k + 1
    return (
        ii[k:k + h, k:k + w] - ii[k:k + h, :w] - ii[:h, k:k + w] + ii[:h, :w]
    )


def np_nlmeans(img: np.ndarray, h: float = 10.0, template: int = 7,
               search: int = 21) -> np.ndarray:
    """F13 parity kernel: non-local-means denoising — the algorithm
    behind cv2.fastNlMeansDenoising(h=10, templateWindowSize=7,
    searchWindowSize=21) in the reference's denoise
    (image_processor.py:182-196). Buades et al. 2005: each pixel is a
    weighted average of every pixel in its search window, weighted by
    exp(-patch_distance/h^2).

    Vectorized per search offset: the shifted squared-difference map
    is box-filtered by an integral image, so the cost is
    O(search^2 * pixels) with no per-pixel Python. cv2's production
    variant approximates exp() with a LUT; values can differ in the
    last digit, the algorithm and its parameters are the same."""
    f = template // 2
    s = search // 2
    x = img.astype(np.float64)
    pmax = s + f
    p = np.pad(x, pmax, mode="reflect")
    hh, ww = img.shape
    acc = np.zeros((hh, ww))
    wsum = np.zeros((hh, ww))
    inv_h2 = 1.0 / (h * h * template * template)
    base_ext = p[pmax - f:pmax + hh + f, pmax - f:pmax + ww + f]
    for dy in range(-s, s + 1):
        for dx in range(-s, s + 1):
            shifted_ext = p[
                pmax + dy - f:pmax + dy + hh + f,
                pmax + dx - f:pmax + dx + ww + f,
            ]
            d2 = _box_sum_valid((shifted_ext - base_ext) ** 2, template)
            w = np.exp(-d2 * inv_h2)
            acc += w * shifted_ext[f:f + hh, f:f + ww]
            wsum += w
    return np.clip(np.rint(acc / wsum), 0, 255).astype(np.uint8)


def np_otsu_threshold(img: np.ndarray) -> int:
    hist = np.bincount(img.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    best_t, best_var = 127, -1.0
    w0 = 0.0
    sum0 = 0.0
    sum_all = (np.arange(256) * hist).sum()
    for t in range(256):
        w0 += hist[t]
        if w0 == 0 or w0 == total:
            continue
        sum0 += t * hist[t]
        m0 = sum0 / w0
        m1 = (sum_all - sum0) / (total - w0)
        var = w0 * (total - w0) * (m0 - m1) ** 2
        if var > best_var:
            best_var, best_t = var, t
    return best_t


def np_binarize(img: np.ndarray, method: str = "otsu",
                threshold: int = 127) -> np.ndarray:
    """F15: binarization → strictly {0, 255} domain
    (test_preprocessing.py:194-210 asserts this)."""
    if method == "otsu":
        t = np_otsu_threshold(img)
    elif method == "adaptive":
        # local-mean adaptive threshold (cv2.adaptiveThreshold MEAN_C
        # analog, image_processor.py:221-226): per-pixel threshold =
        # boxfilter(img, block) - C, via an integral image
        return _np_adaptive_binarize(img, block=15, c=2)
    else:
        t = threshold
    return np.where(img > t, 255, 0).astype(np.uint8)


def _np_adaptive_binarize(img: np.ndarray, block: int = 15,
                          c: int = 2) -> np.ndarray:
    """Windowed local-mean threshold: pixel > mean(neighborhood)-c →
    255. Edge windows are clipped (same as cv2 BORDER_REPLICATE up to
    the mean over the in-bounds region)."""
    h, w = img.shape
    half = block // 2
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(img, axis=0), axis=1, out=ii[1:, 1:])
    y0 = np.clip(np.arange(h) - half, 0, h)
    y1 = np.clip(np.arange(h) + half + 1, 0, h)
    x0 = np.clip(np.arange(w) - half, 0, w)
    x1 = np.clip(np.arange(w) + half + 1, 0, w)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = ii[y1][:, x1] - ii[y1][:, x0] - ii[y0][:, x1] + ii[y0][:, x0]
    thresh = s / area - c
    return np.where(img > thresh, 255, 0).astype(np.uint8)


def np_morph_open(binary: np.ndarray) -> np.ndarray:
    """F16: 3x3 erosion then dilation on a {0,255} image."""
    def erode(x):
        p = np.pad(x, 1, constant_values=255)
        return np.min(np.stack([
            p[i: i + x.shape[0], j: j + x.shape[1]]
            for i in range(3) for j in range(3)
        ]), axis=0)

    def dilate(x):
        p = np.pad(x, 1, constant_values=0)
        return np.max(np.stack([
            p[i: i + x.shape[0], j: j + x.shape[1]]
            for i in range(3) for j in range(3)
        ]), axis=0)

    return dilate(erode(binary)).astype(np.uint8)


def np_resize_nearest(img: np.ndarray, scale: float) -> np.ndarray:
    """F17: nearest-neighbor rescale (adjust_dpi, :264-286)."""
    h, w = img.shape
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    yi = (np.arange(nh) * h // nh).clip(0, h - 1)
    xi = (np.arange(nw) * w // nw).clip(0, w - 1)
    return img[yi][:, xi]


def _true_runs(mask1d: np.ndarray) -> np.ndarray:
    """(start, end) pairs of consecutive-True runs, vectorized."""
    edges = np.flatnonzero(
        np.diff(np.concatenate([[0], mask1d.view(np.int8), [0]]))
    )
    return edges.reshape(-1, 2)


def np_detect_layout(img: np.ndarray, dark: int = 128,
                     min_area: int = 100) -> list[dict]:
    """F18: projection-profile block detection: dark rows → bands,
    dark columns within a band → elements; area>=min_area filter
    (the reference's contour small-area filter, :301-304); output
    sorted top-to-bottom then left-to-right (:329). Run-length
    encoded numpy scans — no per-pixel Python loops."""
    mask = img < dark
    elements: list[dict] = []
    for y, y2 in _true_runs(mask.any(axis=1)):
        bh = int(y2 - y)
        band_cols = mask[y:y2].any(axis=0)
        for x, x2 in _true_runs(band_cols):
            bw = int(x2 - x)
            if bw * bh >= min_area:
                aspect = bw / max(bh, 1)
                etype = "line" if aspect > 5 else ("block" if aspect > 0.5 else "column")
                elements.append({
                    "type": etype, "x": int(x), "y": int(y),
                    "width": bw, "height": bh,
                })
    elements.sort(key=lambda e: (e["y"], e["x"]))
    return elements


def np_detect_tables(img: np.ndarray, min_area: int = 1000) -> list[dict]:
    """F19: table-region detection (image_processor.py:337-369).
    Deviation: the reference builds a morphological H/V line mask with
    cv2; here a table is a projection-profile region whose area
    exceeds the reference's area>1000 filter (:361)."""
    return [
        e for e in np_detect_layout(img, min_area=1)
        if e["width"] * e["height"] > min_area
    ]


def np_crop_to_content(img: np.ndarray, padding: int = 10) -> np.ndarray:
    """F20: bbox of non-white pixels + padding (:371-398)."""
    mask = img < WHITE
    if not mask.any():
        return img
    ys, xs = np.where(mask)
    y0, y1 = max(0, ys.min() - padding), min(img.shape[0], ys.max() + 1 + padding)
    x0, x1 = max(0, xs.min() - padding), min(img.shape[1], xs.max() + 1 + padding)
    return img[y0:y1, x0:x1]


def np_validate_image(img: np.ndarray, min_size: int = 100,
                      max_size: int = 10000) -> tuple[bool, str]:
    """F22: size bounds + blank check (:422-446): reject if <1% of
    pixels are non-white."""
    h, w = img.shape
    if h < min_size or w < min_size:
        return False, "too_small"
    if h > max_size or w > max_size:
        return False, "too_large"
    nonwhite = float((img < WHITE).mean())
    if nonwhite < 0.01:
        return False, "blank"
    return True, "ok"


def np_bbox_from_quad(points: list[tuple[float, float]]) -> tuple[int, int, int, int]:
    """F23: quad corner points → (x, y, w, h)
    (ocr_worker.py:373-379)."""
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    x, y = int(min(xs)), int(min(ys))
    return x, y, int(max(xs)) - x, int(max(ys)) - y


# ---------------------------------------------------------------------------
# Spark UDF layer
# ---------------------------------------------------------------------------

LAYOUT_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("type", T.StringType()),
    T.StructField("x", T.IntegerType()),
    T.StructField("y", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
]))

VALIDATE_SCHEMA = T.StructType([
    T.StructField("valid", T.BooleanType()),
    T.StructField("reason", T.StringType()),
])


@pandas_udf(LAYOUT_SCHEMA)
def detect_layout_udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    out = []
    for raw, w, h in zip(image, width, height):
        img = decode_image(raw, int(w), int(h))
        out.append(np_detect_layout(img))
    return pd.Series(out)


@pandas_udf(VALIDATE_SCHEMA)
def validate_image_udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.DataFrame:
    rows = []
    for raw, w, h in zip(image, width, height):
        img = decode_image(raw, int(w), int(h))
        valid, reason = np_validate_image(img)
        rows.append({"valid": valid, "reason": reason})
    return pd.DataFrame(rows)


@pandas_udf(T.BinaryType())
def binarize_udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    out = []
    for raw, w, h in zip(image, width, height):
        img = decode_image(raw, int(w), int(h))
        out.append(np_binarize(img).tobytes())
    return pd.Series(out)


@pandas_udf(T.BinaryType())
def median_denoise_udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    """F13 as a binary→binary stage (chains with binarize_udf)."""
    out = []
    for raw, w, h in zip(image, width, height):
        out.append(np_median3(decode_image(raw, int(w), int(h))).tobytes())
    return pd.Series(out)


@pandas_udf(T.LongType())
def dark_count_udf(image: pd.Series) -> pd.Series:
    """Count of dark (<128) pixels in a GRAY8 payload — the terminal
    check of binarize/denoise chains."""
    return image.apply(
        lambda raw: int((np.frombuffer(raw, dtype=np.uint8) < 128).sum())
    )


@pandas_udf(T.LongType())
def png_roundtrip_sum_udf(
    image: pd.Series, width: pd.Series, height: pd.Series
) -> pd.Series:
    """S15 PNG codec proof: GRAY8 raster → np_encode_png → real
    np_decode_png → exact int64 pixel sum. Any bit lost or gained in
    the container round-trip changes the sum."""
    out = []
    for raw, w, h in zip(image, width, height):
        img = decode_image(raw, int(w), int(h))
        back = np_decode_png(np_encode_png(img))
        out.append(int(back.astype(np.int64).sum()))
    return pd.Series(out)


@pandas_udf(LAYOUT_SCHEMA)
def detect_tables_udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    out = []
    for raw, w, h in zip(image, width, height):
        out.append(np_detect_tables(decode_image(raw, int(w), int(h))))
    return pd.Series(out)


def resize_binarize_count_udf(scale: float):
    """F17 nearest-neighbor rescale chained into binarize + dark count
    (integer-scale resizes duplicate pixels exactly, so the count
    scales by scale² — oracle-checkable)."""
    @pandas_udf(T.LongType())
    def _udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
        out = []
        for raw, w, h in zip(image, width, height):
            img = np_resize_nearest(decode_image(raw, int(w), int(h)), scale)
            out.append(int((np_binarize(img) < 128).sum()))
        return pd.Series(out)
    return _udf


@pandas_udf(T.StructType([
    T.StructField("out_min", T.IntegerType()),
    T.StructField("out_max", T.IntegerType()),
    T.StructField("n_px", T.LongType()),
]))
def enhance_stats_udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.DataFrame:
    """F14+F21 contrast/gamma enhancement summary (rows-only check:
    percentile interpolation is not worth mirroring in SQL)."""
    rows = []
    for raw, w, h in zip(image, width, height):
        img = decode_image(raw, int(w), int(h))
        out = np_enhance_contrast(img)
        rows.append({
            "out_min": int(out.min()), "out_max": int(out.max()),
            "n_px": int(out.size),
        })
    return pd.DataFrame(rows)


CROP_SCHEMA = T.StructType([
    T.StructField("crop_w", T.IntegerType()),
    T.StructField("crop_h", T.IntegerType()),
])


@pandas_udf(CROP_SCHEMA)
def crop_dims_udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.DataFrame:
    """F20 crop-to-content, emitting the cropped dimensions."""
    rows = []
    for raw, w, h in zip(image, width, height):
        cropped = np_crop_to_content(decode_image(raw, int(w), int(h)))
        rows.append({"crop_w": cropped.shape[1], "crop_h": cropped.shape[0]})
    return pd.DataFrame(rows)


DESKEW_SCHEMA = T.StructType([
    T.StructField("inject_deg", T.DoubleType()),
    T.StructField("delta_deg", T.DoubleType()),
    T.StructField("sharp_gain", T.DoubleType()),
])


@pandas_udf(DESKEW_SCHEMA)
def deskew_report_udf(
    image: pd.Series, width: pd.Series, height: pd.Series, inject: pd.Series
) -> pd.DataFrame:
    """F12 deskew under a known injected skew: rotate the page by
    `inject` degrees, run the PCA deskew, report the angle DELTA the
    estimator saw (est(rotated) − est(base), which should track the
    injection) and the projection-profile sharpness recovered by the
    correction (corrected / skewed, ≥ 1 when deskew helps)."""
    rows = []
    for raw, w, h, a in zip(image, width, height, inject):
        base = decode_image(raw, int(w), int(h))
        est_base = np_text_angle_pca(base)
        skewed = np_rotate(base, float(a))
        corrected, est_rot = deskew(skewed)
        s0 = np_profile_sharpness(skewed)
        s1 = np_profile_sharpness(corrected)
        rows.append({
            "inject_deg": float(a),
            "delta_deg": est_rot - est_base,
            "sharp_gain": (s1 / s0) if s0 > 0 else 1.0,
        })
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# TIFF codec (S15) — baseline uncompressed grayscale, both byte orders
# ---------------------------------------------------------------------------

_TIFF_TAGS = {256: "width", 257: "height", 258: "bps", 259: "compression",
              262: "photometric", 273: "strip_offsets", 277: "spp",
              278: "rows_per_strip", 279: "strip_counts"}

# TIFF 6.0 §7 Compression tag values this reader/writer speaks
_TIFF_NONE, _TIFF_LZW, _TIFF_PACKBITS = 1, 5, 32773
_LZW_CLEAR, _LZW_EOI = 256, 257


def _packbits_encode(data: bytes) -> bytes:
    """Apple PackBits (TIFF 6.0 §9): runs ≥2 → (257-n, byte), literals
    → (n-1, bytes); both capped at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:                              # replicate run
            out.append(256 - (j - i))
            out.append(data[i])
            i = j + 1
        else:                                  # literal run
            while (j + 1 < n and (j + 2 >= n or data[j + 1] != data[j + 2])
                   and j - i < 127):
                j += 1
            out.append(j - i)
            out += data[i:j + 1]
            i = j + 1
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n == 128:                           # no-op per spec
            continue
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("PackBits literal overruns input")
            out += data[i:i + n + 1]
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError("PackBits run overruns input")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) != expect:
        raise ValueError("PackBits output size mismatch")
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, 9-bit initial width,
    256=Clear 257=EOI, 'early change' width bumps, clear at 4094."""
    out_bits: list[tuple[int, int]] = []
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    out_bits.append((_LZW_CLEAR, width))
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1:      # early change (encoder)
            width += 1
        if next_code == 4094:                  # table nearly full
            out_bits.append((_LZW_CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((_LZW_EOI, width))
    acc = nb = 0
    out = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        nb += wd
        while nb >= 8:
            nb -= 8
            out.append((acc >> nb) & 0xFF)
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expect: int) -> bytes:
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < expect:
        if pos + width > len(bits):
            raise ValueError("LZW stream truncated")
        code = 0
        for b in bits[pos:pos + width].tolist():
            code = (code << 1) | b
        pos += width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):               # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by ONE entry (it appends after reading the code the
        # encoder emitted after adding), so it widens at 2^w − 2 where
        # the encoder widens at 2^w − 1 (libtiff convention)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expect:
        raise ValueError("LZW output size mismatch")
    return bytes(out)


def np_encode_tiff_gray(img: np.ndarray, big_endian: bool = False,
                        compression: int = _TIFF_NONE,
                        rows_per_strip: int | None = None) -> bytes:
    """TIFF 6.0 writer: 8-bit gray strips, Compression 1 (none),
    5 (LZW) or 32773 (PackBits), optional multi-strip."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    e2 = lambda v: int(v).to_bytes(2, "big" if big_endian else "little")
    e4 = lambda v: int(v).to_bytes(4, "big" if big_endian else "little")
    rps = h if rows_per_strip is None else rows_per_strip
    enc = {_TIFF_NONE: bytes, _TIFF_LZW: _lzw_encode,
           _TIFF_PACKBITS: _packbits_encode}.get(compression)
    if enc is None:
        raise ValueError(f"unsupported TIFF compression {compression}")
    strips = [enc(img[r:r + rps].tobytes()) for r in range(0, h, rps)]
    offs, at = [], 8
    for s in strips:
        offs.append(at)
        at += len(s)
    pix = b"".join(strips)
    ifd_off = 8 + len(pix)
    ns = len(strips)
    # >1 strip: offset/count arrays live after the IFD entries
    arr_off = ifd_off + 2 + 9 * 12 + 4
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, compression), (262, 3, 1, 1),
        (273, 4, ns, offs[0] if ns == 1 else arr_off),
        (277, 3, 1, 1), (278, 3, 1, rps),
        (279, 4, ns, len(strips[0]) if ns == 1 else arr_off + 4 * ns),
    ]
    ifd = e2(len(entries))
    for tag, typ, cnt, val in entries:
        # SHORT values are LEFT-justified in the 4-byte field (TIFF §2)
        v = e4(val) if typ == 4 else e2(val) + b"\x00\x00"
        ifd += e2(tag) + e2(typ) + e4(cnt) + v
    ifd += e4(0)
    if ns > 1:                                 # out-of-line LONG arrays
        ifd += b"".join(e4(o) for o in offs)
        ifd += b"".join(e4(len(s)) for s in strips)
    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + e4(ifd_off)
    return hdr + pix + ifd


def np_decode_tiff_gray(raw: bytes) -> np.ndarray:
    """TIFF reader: 8-bit grayscale, II/MM byte orders, multi-strip,
    Compression 1 (none), 5 (LZW, §13 early-change) or 32773
    (PackBits), Photometric 0 (WhiteIsZero, inverted) or 1. JPEG-in-
    TIFF and other codecs raise NotImplementedError — the reference
    decodes via cv2.imdecode (ocr_worker.py:283-308)."""
    if raw[:4] == b"II*\x00":
        end = "little"
    elif raw[:4] == b"MM\x00*":
        end = "big"
    else:
        raise ValueError("not a TIFF (bad byte-order/magic)")
    d2 = lambda b: int.from_bytes(b, end)
    ifd_off = d2(raw[4:8])
    if ifd_off + 2 > len(raw):
        raise ValueError("TIFF IFD offset out of range")
    n = d2(raw[ifd_off:ifd_off + 2])
    tags: dict[str, list[int]] = {}
    for i in range(n):
        at = ifd_off + 2 + i * 12
        ent = raw[at:at + 12]
        if len(ent) < 12:
            raise ValueError("truncated TIFF IFD")
        tag, typ = d2(ent[0:2]), d2(ent[2:4])
        cnt = d2(ent[4:8])
        if tag not in _TIFF_TAGS:
            continue
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            raise ValueError(f"TIFF type {typ} unsupported for tag {tag}")
        if size * cnt <= 4:
            buf = ent[8:8 + size * cnt]
        else:
            off = d2(ent[8:12])
            buf = raw[off:off + size * cnt]
        vals = [d2(buf[j * size:(j + 1) * size]) for j in range(cnt)]
        tags[_TIFF_TAGS[tag]] = vals
    try:
        w, h = tags["width"][0], tags["height"][0]
        offs, cnts = tags["strip_offsets"], tags["strip_counts"]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from None
    comp = tags.get("compression", [_TIFF_NONE])[0]
    if comp not in (_TIFF_NONE, _TIFF_LZW, _TIFF_PACKBITS):
        raise NotImplementedError(
            f"TIFF compression {comp} needs a codec "
            "(cv2 path in the reference; 1/5/32773 supported here)"
        )
    if tags.get("bps", [8])[0] != 8 or tags.get("spp", [1])[0] != 1:
        raise NotImplementedError("only 8-bit single-sample TIFF")
    rps = tags.get("rows_per_strip", [h])[0]
    if rps <= 0 or len(offs) != len(cnts):
        raise ValueError("TIFF strip layout invalid")
    parts = []
    for si, (o, c) in enumerate(zip(offs, cnts)):
        if o + c > len(raw):
            raise ValueError("TIFF strip overruns file")
        strip = raw[o:o + c]
        # rows in THIS strip (last strip may be short)
        srows = min(rps, h - si * rps)
        if srows <= 0:
            raise ValueError("TIFF has more strips than rows")
        if comp == _TIFF_LZW:
            strip = _lzw_decode(strip, srows * w)
        elif comp == _TIFF_PACKBITS:
            strip = _packbits_decode(strip, srows * w)
        parts.append(strip)
    data = b"".join(parts)
    if len(data) < w * h:
        raise ValueError("TIFF pixel data truncated")
    img = np.frombuffer(data[: w * h], dtype=np.uint8).reshape(h, w)
    if tags.get("photometric", [1])[0] == 0:         # WhiteIsZero
        img = 255 - img
    return img


# ---------------------------------------------------------------------------
# cv2-construction interpolation kernels (F12/F15/F17 parity): bicubic
# resize/warpAffine (INTER_CUBIC, a=-0.75, half-pixel centers,
# replicate border) and the Gaussian adaptive threshold
# ---------------------------------------------------------------------------

def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """The 4 bicubic tap weights at fractional phase t in [0,1) —
    the Keys kernel with OpenCV's a=-0.75 (modules/imgproc: interpolateCubic).
    Taps cover offsets (-1, 0, 1, 2) relative to floor(coord); the
    kernel is a partition of unity, so weights sum to exactly 1."""
    w = np.empty(t.shape + (4,), dtype=np.float64)
    for i, off in enumerate((-1.0, 0.0, 1.0, 2.0)):
        x = np.abs(t - off)
        w[..., i] = np.where(
            x <= 1.0,
            ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a,
                     0.0),
        )
    return w


def _sample_bicubic(img: np.ndarray, fy: np.ndarray,
                    fx: np.ndarray) -> np.ndarray:
    """Sample img at float coords (fy, fx) elementwise with bicubic
    interpolation and replicate border (coordinates clamped)."""
    h, w = img.shape
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    wy = _cubic_weights(fy - y0)
    wx = _cubic_weights(fx - x0)
    out = np.zeros(fy.shape, dtype=np.float64)
    for j in range(4):
        yj = np.clip(y0 + (j - 1), 0, h - 1)
        row_acc = np.zeros(fy.shape, dtype=np.float64)
        for i in range(4):
            xi = np.clip(x0 + (i - 1), 0, w - 1)
            row_acc += wx[..., i] * img[yj, xi]
        out += wy[..., j] * row_acc
    return out


def np_resize_cubic(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """F17 parity kernel: cv2.resize(..., INTER_CUBIC) — the DPI
    upscaler (image_processor.py:264-286). Half-pixel-center mapping
    src = (dst + 0.5) * (in/out) - 0.5, bicubic a=-0.75, clamped
    borders. np_resize_nearest stays for the hashed oracle legs."""
    h, w = img.shape
    fy = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    out = _sample_bicubic(
        img.astype(np.float64), fy[:, None] * np.ones_like(fx)[None, :],
        np.ones_like(fy)[:, None] * fx[None, :],
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def np_warp_affine_cubic(img: np.ndarray, m: np.ndarray,
                         out_shape: tuple[int, int] | None = None
                         ) -> np.ndarray:
    """F12 parity kernel: cv2.warpAffine(..., INTER_CUBIC,
    BORDER_REPLICATE) — the deskew rotation application
    (image_processor.py:174). ``m`` is the forward 2x3 src->dst
    matrix (cv2.getRotationMatrix2D layout); each destination pixel
    samples the source at the inverted transform with bicubic
    interpolation and replicate border."""
    h, w = img.shape
    oh, ow = out_shape or (h, w)
    m = np.asarray(m, dtype=np.float64)
    a_lin = m[:, :2]
    t_vec = m[:, 2]
    inv = np.linalg.inv(a_lin)
    yy, xx = np.mgrid[0:oh, 0:ow].astype(np.float64)
    sx = inv[0, 0] * (xx - t_vec[0]) + inv[0, 1] * (yy - t_vec[1])
    sy = inv[1, 0] * (xx - t_vec[0]) + inv[1, 1] * (yy - t_vec[1])
    out = _sample_bicubic(img.astype(np.float64), sy, sx)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def np_gaussian_kernel1d(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, sigma=-1): sigma from the
    documented formula 0.3*((ksize-1)*0.5 - 1) + 0.8, sampled
    exp(-i^2/(2 sigma^2)) around the center, normalized to sum 1."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    i = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(i * i) / (2.0 * sigma * sigma))
    return k / k.sum()


def np_adaptive_threshold_gaussian(img: np.ndarray, block: int = 11,
                                   c: float = 2.0) -> np.ndarray:
    """F15 parity kernel: cv2.adaptiveThreshold(..., ADAPTIVE_THRESH_
    GAUSSIAN_C, THRESH_BINARY, blockSize=11, C=2) — the reference's
    default binarize branch (image_processor.py:217-236). The local
    threshold is the Gaussian-weighted block mean (separable blur,
    replicate border, rounded to uint8 as cv2's 8-bit path does)
    minus C; dst = 255 where src > threshold."""
    k = np_gaussian_kernel1d(block)
    half = block // 2
    x = img.astype(np.float64)
    p = np.pad(x, ((half, half), (0, 0)), mode="edge")
    vert = np.zeros_like(x)
    for j in range(block):
        vert += k[j] * p[j:j + img.shape[0], :]
    p2 = np.pad(vert, ((0, 0), (half, half)), mode="edge")
    mean = np.zeros_like(x)
    for j in range(block):
        mean += k[j] * p2[:, j:j + img.shape[1]]
    thresh = np.rint(mean) - c
    return np.where(x > thresh, 255, 0).astype(np.uint8)


def np_morph_open2(binary: np.ndarray) -> np.ndarray:
    """Morphological opening with the reference denoise step's 2x2
    all-ones kernel (image_processor.py:189-191; cv2 anchors an even
    kernel at (1,1), so erosion looks up-left and dilation mirrors)."""
    def erode(x):
        p = np.pad(x, ((1, 0), (1, 0)), mode="edge")
        return np.minimum.reduce([
            p[0:-1, 0:-1], p[0:-1, 1:], p[1:, 0:-1], p[1:, 1:]
        ])

    def dilate(x):
        p = np.pad(x, ((0, 1), (0, 1)), mode="edge")
        return np.maximum.reduce([
            p[0:-1, 0:-1], p[0:-1, 1:], p[1:, 0:-1], p[1:, 1:]
        ])

    return dilate(erode(binary)).astype(np.uint8)


def np_preprocess_image_reference(
    img: np.ndarray,
    deskew: bool = True,
    denoise: bool = True,
    enhance_contrast: bool = True,
    binarize: bool = False,
    gamma: float = 1.2,
) -> np.ndarray:
    """The reference's preprocess_image composition over the parity
    kernels (image_processor.py:20-76): deskew (PCA angle + the
    cv2-construction INTER_CUBIC warp with replicate border, :143-180)
    -> denoise (non-local means h=10/7/21 + 2x2 opening, :182-196;
    NOTE the reference code names the opening op cv2.MORPH_OPENING,
    which does not exist — cv2 spells it MORPH_OPEN — so its runtime
    denoise silently returns the input via the surrounding
    try/except; the intended semantics are implemented here)
    -> enhance (CLAHE clipLimit=2 8x8 + gamma-1.2 LUT, :198-215)
    -> optional binarize (Gaussian adaptive threshold 11/2, :217-236).
    All stages preserve dimensions."""
    import math

    out = img
    if deskew:
        angle = np_text_angle_pca(out)
        if abs(angle) > 0.5:
            h, w = out.shape
            cy, cx = h // 2, w // 2
            a = math.radians(-angle)
            m = np.array([
                [math.cos(a), math.sin(a),
                 (1 - math.cos(a)) * cx - math.sin(a) * cy],
                [-math.sin(a), math.cos(a),
                 math.sin(a) * cx + (1 - math.cos(a)) * cy],
            ])
            out = np_warp_affine_cubic(out, m)
    if denoise:
        out = np_morph_open2(np_nlmeans(out))
    if enhance_contrast:
        out = np_clahe(out)
        inv_gamma = 1.0 / gamma
        lut = ((np.arange(256) / 255.0) ** inv_gamma * 255).astype(np.uint8)
        out = lut[out]
    if binarize:
        out = np_adaptive_threshold_gaussian(out)
    return out
