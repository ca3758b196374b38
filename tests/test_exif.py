"""F11 EXIF orientation branch (image_processor.py:81-98): APP1/TIFF
tag-274 write+parse on real baseline JPEGs, the reference's 3/6/8
quarter-turn table, and the ingest edge (an EXIF-bearing JPEG must
sniff, validate, and enqueue exactly like a plain one)."""

from __future__ import annotations

import numpy as np
import pytest

from streamprocess_spark.functions.image import (
    auto_rotate,
    exif_orientation_inverse,
    np_apply_exif_orientation,
)
from streamprocess_spark.functions.jpeg import (
    np_decode_jpeg_gray,
    np_encode_jpeg_gray,
    np_encode_jpeg_gray_exif,
    np_exif_app1,
    np_jpeg_exif_orientation,
)


def _img(d: int = 0, h: int = 24, w: int = 16) -> np.ndarray:
    return ((np.arange(h)[:, None] * 31 + np.arange(w)[None, :] * 17 + d)
            % 256).astype(np.uint8)


@pytest.mark.parametrize("byte_order", ["II", "MM"])
@pytest.mark.parametrize("orientation", list(range(1, 9)))
def test_orientation_roundtrip(orientation, byte_order):
    raw = np_encode_jpeg_gray_exif(_img(), orientation, byte_order=byte_order)
    assert np_jpeg_exif_orientation(raw) == orientation
    # APP1 must be transparent to the pixel decoder
    assert np_decode_jpeg_gray(raw).shape == (24, 16)


def test_no_exif_defaults_to_normal():
    assert np_jpeg_exif_orientation(np_encode_jpeg_gray(_img())) == 1
    assert np_jpeg_exif_orientation(b"") == 1
    assert np_jpeg_exif_orientation(b"\xff\xd8\xff\xd9") == 1


def test_malformed_tiff_payload_is_advisory():
    """A broken EXIF payload yields orientation 1, never an exception —
    the reference wraps its EXIF branch in a bare except (image_
    processor.py:96-97) because the tag is metadata, not image data."""
    from streamprocess_spark.functions.jpeg import _seg

    plain = np_encode_jpeg_gray(_img())
    for junk in (b"", b"ZZ" + b"\x00" * 10,
                 b"II" + (41).to_bytes(2, "little") + b"\x00" * 8,
                 b"MM" + b"\x00\x2a" + (10 ** 6).to_bytes(4, "big")):
        bad = plain[:2] + _seg(0xE1, b"Exif\x00\x00" + junk) + plain[2:]
        assert np_jpeg_exif_orientation(bad) == 1
        assert np_decode_jpeg_gray(bad).shape == (24, 16)


def test_quarter_turn_table_matches_reference():
    """3 -> 180, 6 -> clockwise 90, 8 -> counter-clockwise 90; the
    mirrored orientations 2/4/5/7 (and 1) are left untouched, exactly
    the branches the reference takes."""
    img = _img(3)
    assert np.array_equal(np_apply_exif_orientation(img, 3), img[::-1, ::-1])
    assert np.array_equal(np_apply_exif_orientation(img, 6), img.T[:, ::-1])
    assert np.array_equal(np_apply_exif_orientation(img, 8), img.T[::-1, :])
    for o in (1, 2, 4, 5, 7):
        assert np_apply_exif_orientation(img, o) is img


@pytest.mark.parametrize("orientation", [3, 6, 8])
def test_inverse_restores_exactly(orientation):
    img = _img(7)
    rot = np_apply_exif_orientation(img, orientation)
    inv = exif_orientation_inverse(orientation)
    assert np.array_equal(np_apply_exif_orientation(rot, inv), img)
    assert int(rot.sum()) == int(img.sum())  # permutation invariant


def test_auto_rotate_applies_exif_first():
    img = _img(9)
    out, fine = auto_rotate(img, max_angle=0.0, exif_orientation=6)
    assert fine == 0.0
    assert np.array_equal(out, np_apply_exif_orientation(img, 6))
    # default keeps the old behavior bit-for-bit
    legacy, _ = auto_rotate(img, max_angle=0.0)
    assert np.array_equal(legacy, img)


def test_exif_jpeg_through_ingest_edge(tmp_path):
    """Sniff -> validate -> enqueue parity with a plain JPEG: the APP1
    segment changes neither the routing nor the validation verdict."""
    from streamprocess_spark.io.ingest import ingest_bytes, sniff_format

    raw = np_encode_jpeg_gray_exif(_img(1), 6, byte_order="MM")
    assert sniff_format(raw)[0] == "JPEG"
    env = ingest_bytes(str(tmp_path), raw, name="rot.jpg", enqueued_at=1.0)
    assert (env["type"], env["payload"]["format"]) == ("ocr_single", "JPEG")


def test_app1_segment_shape():
    """The emitted APP1 is a spec-shaped TIFF: readable by our own
    walker at any position after SOI and with either endianness."""
    seg = np_exif_app1(5, "MM")
    assert seg[:2] == b"\xff\xe1"
    assert seg[4:10] == b"Exif\x00\x00"
    with pytest.raises(ValueError):
        np_exif_app1(0)
    with pytest.raises(ValueError):
        np_exif_app1(9)
    with pytest.raises(ValueError):
        np_exif_app1(1, "XX")
