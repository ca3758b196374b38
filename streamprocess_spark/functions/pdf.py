"""PDF scanned-document container (SURVEY §2.1 S15), stdlib-only.

The reference's OCR path accepts PDF uploads (accepted formats,
src/grpc_server/server.py:354) and rasterizes via its cv2/pdf stack.
This module covers the dominant scanned-document shape — a PDF page
wrapping ONE full-page image XObject — without a PDF library:

  extractor — find `/Subtype /Image` stream objects, parse /Width,
    /Height, /BitsPerComponent, /ColorSpace, /Filter from the stream
    dict, and decode the payload:
      /FlateDecode      → stdlib zlib (lossless — exact-pixel oracles)
      /DCTDecode        → the repo's own JPEG decoder (baseline AND
                          progressive, functions/jpeg.py)
      /LZWDecode        → the repo's TIFF §13 LZW codec (PDF's default
                          EarlyChange=1 IS the TIFF variant)
      /RunLengthDecode  → PackBits-style RLE with the 128 EOD marker
      /ASCIIHexDecode / /ASCII85Decode → transport armors (PDF 32000
                          §7.4.2-3), incl. the `z` zero-group shorthand
      (no filter)       → raw gray raster
    /Filter arrays apply as a chain in order, e.g.
    [/ASCII85Decode /FlateDecode]. Multi-image PDFs return every
    image in object order.

  emitter — writes a structurally valid single-page PDF (catalog,
    page tree, image XObject, content stream, xref, trailer) around a
    grayscale raster, for fixtures and the ingestion edge.

Not a general PDF renderer: text content, CCITT/JBIG2 faxes, and
encrypted files raise NotImplementedError with citations.
"""

from __future__ import annotations

import re
import zlib

import numpy as np


def _rle_encode(data: bytes) -> bytes:
    """PDF RunLengthDecode inverse (PackBits-style + 128 EOD)."""
    from streamprocess_spark.functions.image import _packbits_encode

    return _packbits_encode(data) + b"\x80"


def _rle_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n == 128:                                   # EOD
            break
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("RunLengthDecode literal overruns stream")
            out += data[i:i + n + 1]
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError("RunLengthDecode run overruns stream")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) < expect:
        raise ValueError("RunLengthDecode output shorter than expected")
    return bytes(out)


def _a85_encode(data: bytes) -> bytes:
    import base64

    return base64.a85encode(data) + b"~>"


def _a85_decode(data: bytes) -> bytes:
    import base64

    end = data.find(b"~>")
    body = data[:end] if end >= 0 else data
    body = bytes(b for b in body if not chr(b).isspace())
    try:
        return base64.a85decode(body)
    except ValueError as e:
        raise ValueError(f"bad ASCII85 stream: {e}") from None


def _ahx_decode(data: bytes) -> bytes:
    end = data.find(b">")
    body = data[:end] if end >= 0 else data
    hexs = bytes(b for b in body if not chr(b).isspace())
    if len(hexs) % 2:                                  # §7.4.2: pad with 0
        hexs += b"0"
    try:
        return bytes.fromhex(hexs.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as e:
        raise ValueError(f"bad ASCIIHex stream: {e}") from None


def np_build_pdf_image(img: np.ndarray, filter_: str = "FlateDecode") -> bytes:
    """One-page PDF embedding `img` as a full-page DeviceGray XObject.
    `filter_` may also be "ASCII85+Flate" for a two-stage chain."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    if filter_ == "FlateDecode":
        payload = zlib.compress(img.tobytes(), 6)
        filt = "/Filter /FlateDecode"
    elif filter_ == "DCTDecode":
        from streamprocess_spark.functions.jpeg import np_encode_jpeg_gray

        payload = np_encode_jpeg_gray(img, quality=50)
        filt = "/Filter /DCTDecode"
    elif filter_ == "LZWDecode":
        from streamprocess_spark.functions.image import _lzw_encode

        payload = _lzw_encode(img.tobytes())
        filt = "/Filter /LZWDecode"
    elif filter_ == "RunLengthDecode":
        payload = _rle_encode(img.tobytes())
        filt = "/Filter /RunLengthDecode"
    elif filter_ == "ASCIIHexDecode":
        payload = img.tobytes().hex().encode() + b">"
        filt = "/Filter /ASCIIHexDecode"
    elif filter_ == "ASCII85+Flate":
        payload = _a85_encode(zlib.compress(img.tobytes(), 6))
        filt = "/Filter [/ASCII85Decode /FlateDecode]"
    elif filter_ is None:
        payload = img.tobytes()
        filt = ""
    else:
        raise ValueError(f"unsupported PDF image filter {filter_}")

    content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Resources << /XObject << /Im0 4 0 R >> >> "
            f"/Contents 5 0 R >>"
        ).encode(),
        (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 8 {filt} "
            f"/Length {len(payload)} >>"
        ).encode()
        + b"\nstream\n" + payload + b"\nendstream",
        (f"<< /Length {len(content)} >>").encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


_IMG_OBJ_RE = re.compile(
    rb"<<(?P<dict>(?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*?/Subtype\s*/Image"
    rb"(?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*?)>>\s*stream\r?\n",
    re.DOTALL,
)


def _dict_int(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)", d)
    return int(m.group(1)) if m else None


def np_extract_pdf_images(raw: bytes) -> list[np.ndarray]:
    """All image XObjects in a PDF, decoded to HxW uint8 grayscale,
    in file order."""
    if raw[:5] != b"%PDF-":
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in raw:
        raise NotImplementedError("encrypted PDF")
    out: list[np.ndarray] = []
    for m in _IMG_OBJ_RE.finditer(raw):
        d = m.group("dict")
        w, h = _dict_int(d, b"Width"), _dict_int(d, b"Height")
        length = _dict_int(d, b"Length")
        bpc = _dict_int(d, b"BitsPerComponent") or 8
        if w is None or h is None or length is None:
            raise ValueError("PDF image XObject missing Width/Height/Length")
        if bpc != 8:
            raise NotImplementedError(f"PDF image BitsPerComponent {bpc}")
        start = m.end()
        payload = raw[start:start + length]
        if len(payload) < length:
            raise ValueError("PDF stream truncated")
        # /Filter: single name or an array chain, applied in order
        fa = re.search(rb"/Filter\s*\[([^\]]*)\]", d)
        if fa:
            chain = [f.decode() for f in re.findall(rb"/(\w+)", fa.group(1))]
        else:
            fm = re.search(rb"/Filter\s*/(\w+)", d)
            chain = [fm.group(1).decode()] if fm else []
        img = None
        for fi, filt in enumerate(chain):
            last = fi == len(chain) - 1
            if filt == "FlateDecode":
                try:
                    payload = zlib.decompress(payload)
                except zlib.error as e:
                    raise ValueError(f"bad FlateDecode stream: {e}") from None
            elif filt == "LZWDecode":
                from streamprocess_spark.functions.image import _lzw_decode

                payload = _lzw_decode(payload, w * h)
            elif filt == "RunLengthDecode":
                payload = _rle_decode(payload, w * h if last else 0)
            elif filt == "ASCII85Decode":
                payload = _a85_decode(payload)
            elif filt == "ASCIIHexDecode":
                payload = _ahx_decode(payload)
            elif filt == "DCTDecode":
                from streamprocess_spark.functions.jpeg import (
                    np_decode_jpeg_gray,
                )

                img = np_decode_jpeg_gray(payload)
                if img.shape != (h, w):
                    raise ValueError(
                        "DCTDecode dims disagree with XObject dict"
                    )
            else:
                raise NotImplementedError(
                    f"PDF image filter {filt} (CCITT/JBIG2 need codec "
                    "libs; reference rasterizes via its cv2/pdf stack)"
                )
        if img is None:                        # raster path (or no filter)
            if len(payload) < w * h:
                raise ValueError("PDF image data shorter than Width*Height")
            img = np.frombuffer(
                bytes(payload[: w * h]), dtype=np.uint8
            ).reshape(h, w)
        out.append(img)
    if not out:
        raise ValueError("PDF contains no image XObjects")
    return out
