"""GIF87a/89a codec (SURVEY §2.1 S15), dependency-free NumPy.

Web-scraped training corpora are full of GIFs (the reference accepts
general image uploads on its OCR path and decodes via cv2.imdecode,
src/workers/ocr_worker.py:283-308). Implemented from the public GIF
specification:

  decoder — logical screen descriptor, global AND local color tables,
    extension-block skipping (GCE/comment/application), multi-frame
    image descriptors, interlaced row ordering (8/8, 8/8+4, 4/4+2,
    2/2+1 passes), and the GIF flavor of LZW: LSB-first bit packing,
    sub-block packetization, initial width = min_code_size+1,
    Clear/EOI codes, width growth at table size 2^width WITHOUT the
    TIFF early-change, 12-bit cap, mid-stream Clear resets, and the
    KwKwK case. Returns every frame as (H, W, 3) RGB via palette
    lookup. Totality: every malformed stream raises ValueError (the
    ingest dead-letter contract).

  encoder — writes spec-valid single-frame GIFs (optionally
    interlaced) for fixtures and the ingestion edge, with a real LZW
    compressor (table-driven, Clear at 4096).

Note the deliberate contrast with functions/image.py's TIFF LZW: the
two LZW dialects differ in bit order (MSB vs LSB), code bookkeeping
(early change vs not) and framing (strips vs sub-blocks) — sharing an
implementation would get one of them silently wrong.

Scale: pure per-row byte parsing behind Arrow pandas UDFs — map-only.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def looks_like_gif(raw: bytes) -> bool:
    return raw[:6] in (b"GIF87a", b"GIF89a")


def _lzw_gif_decode(data: bytes, mcs: int, expect: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits              # LSB-first packing
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                   # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        # no early change: widen when the table itself fills 2^width
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expect:
            break
    if len(out) < expect:
        raise ValueError("GIF pixel data incomplete")
    return bytes(out[:expect])


def _lzw_gif_encode(data: bytes, mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = eoi + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    w_ = b""
    for ch in data:
        wc = w_ + bytes([ch])
        if wc in table:
            w_ = wc
            continue
        emit(table[w_], width)
        table[wc] = next_code
        next_code += 1
        # decoder's table lags ours by one entry; widen as it fills
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = eoi + 1
            width = mcs + 1
        w_ = bytes([ch])
    if w_:
        emit(table[w_], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def np_encode_gif(idx: np.ndarray, palette: np.ndarray,
                  interlace: bool = False,
                  version: bytes = b"GIF89a") -> bytes:
    """Single-frame GIF from an HxW index array + (N,3) RGB palette."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("need 2-D indices and (N,3) palette")
    h, w = idx.shape
    n = len(palette)
    if not 2 <= n <= 256 or int(idx.max(initial=0)) >= n:
        raise ValueError("palette size/index range invalid")
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(version)
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += pal.tobytes()
    flags = 0x40 if interlace else 0
    out += b"," + struct.pack("<HHHH", 0, 0, w, h) + bytes([flags])
    if interlace:
        data = np.concatenate(
            [idx[s::st] for (s, st) in _INTERLACE], axis=0
        ).tobytes()
    else:
        data = idx.tobytes()
    mcs = max(2, bits)
    out += bytes([mcs])
    lzw = _lzw_gif_encode(data, mcs)
    for i in range(0, len(lzw), 255):
        blk = lzw[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00;"
    return bytes(out)


def np_decode_gif(raw: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    """All frames COMPOSITED onto the (H, W, 3) uint8 RGB logical
    screen, + the logical screen size.

    Round-4 advice: real-world animated GIFs encode later frames as
    partial sub-rectangles at (left, top); returning them un-composited
    gave multi-frame stats semantically wrong per-frame values. This
    decoder now follows the GIF89a disposal model (spec §23, Graphic
    Control Extension): each frame is painted onto the screen canvas at
    its offset (transparent-index pixels leave the canvas untouched),
    and after emission disposal 2 restores the frame rect to the
    background color while disposal 3 restores the pre-frame canvas.
    Full-screen frames (offsets 0, frame dims == screen dims, the
    in-repo fixture shape) compose to exactly their own raster."""
    if not looks_like_gif(raw):
        raise ValueError("not a GIF (bad signature)")
    if len(raw) < 13:
        raise ValueError("GIF header truncated")
    w, h = struct.unpack_from("<HH", raw, 6)
    packed = raw[10]
    bg_index = raw[11]
    gct = None
    pos = 13
    if packed & 0x80:
        size = 2 << (packed & 7)
        tbl = np.frombuffer(raw[pos:pos + 3 * size], dtype=np.uint8)
        if len(tbl) < 3 * size:
            raise ValueError("GIF global color table truncated")
        gct = tbl.reshape(size, 3)
        pos += 3 * size
    bg_color = (
        gct[bg_index] if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:, :] = bg_color
    gce: tuple[int, int | None] | None = None      # (disposal, t_index)
    frames: list[np.ndarray] = []
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:                              # trailer
            break
        if b == 0x21:                              # extension block
            if pos + 2 > len(raw):
                raise ValueError("GIF extension truncated")
            label = raw[pos + 1]
            pos += 2
            ext = bytearray()
            while pos < len(raw) and raw[pos] != 0:
                ext += raw[pos + 1:pos + 1 + raw[pos]]
                pos += 1 + raw[pos]
            if pos >= len(raw):
                raise ValueError("GIF extension truncated")
            pos += 1
            if label == 0xF9 and len(ext) >= 4:    # Graphic Control
                p = ext[0]
                gce = ((p >> 2) & 7, ext[3] if (p & 1) else None)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 10 > len(raw):
            raise ValueError("GIF image descriptor truncated")
        ix, iy, iw, ih = struct.unpack_from("<HHHH", raw, pos + 1)
        if ix + iw > w or iy + ih > h:
            raise ValueError("GIF frame rect exceeds logical screen")
        if iw == 0 or ih == 0:
            raise ValueError("GIF frame has zero dimension")
        flags = raw[pos + 9]
        pos += 10
        lct = gct
        if flags & 0x80:
            size = 2 << (flags & 7)
            tbl = np.frombuffer(raw[pos:pos + 3 * size], dtype=np.uint8)
            if len(tbl) < 3 * size:
                raise ValueError("GIF local color table truncated")
            lct = tbl.reshape(size, 3)
            pos += 3 * size
        if lct is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(raw):
            raise ValueError("GIF truncated before LZW code size")
        mcs = raw[pos]
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad GIF LZW min code size {mcs}")
        pos += 1
        lzw = bytearray()
        while pos < len(raw) and raw[pos] != 0:
            ln = raw[pos]
            blk = raw[pos + 1:pos + 1 + ln]
            if len(blk) < ln:
                raise ValueError("GIF data sub-block truncated")
            lzw += blk
            pos += 1 + ln
        if pos >= len(raw):
            raise ValueError("GIF missing block terminator")
        pos += 1
        pix = _lzw_gif_decode(bytes(lzw), mcs, iw * ih)
        idx = np.frombuffer(pix, dtype=np.uint8).reshape(ih, iw)
        if int(idx.max(initial=0)) >= len(lct):
            raise ValueError("GIF index out of palette range")
        if flags & 0x40:                           # deinterlace
            out = np.empty_like(idx)
            at = 0
            for (s, st) in _INTERLACE:
                nrows = len(range(s, ih, st))
                out[s::st] = idx[at:at + nrows]
                at += nrows
            idx = out
        disposal, t_index = gce if gce is not None else (0, None)
        gce = None
        prev = canvas.copy() if disposal == 3 else None
        rgb = lct[idx]
        region = canvas[iy:iy + ih, ix:ix + iw]
        if t_index is not None:
            mask = idx != t_index
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:                          # restore to background
            canvas[iy:iy + ih, ix:ix + iw] = bg_color
        elif disposal == 3 and prev is not None:   # restore to previous
            canvas = prev
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, (w, h)
