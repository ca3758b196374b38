"""Unit tests for the scalar-function library (SURVEY §2.10), pure
numpy — mirroring the reference's own property assertions
(tests/unit/test_preprocessing.py): resample length, normalization
bounds, binarize {0,255} domain, crop-contains-content, blank/size
validation, plus determinism of the mock inference layer."""

from __future__ import annotations

import numpy as np
import pytest

from streamprocess_spark.functions import audio as A
from streamprocess_spark.functions import image as I
from streamprocess_spark.functions import inference as M


def _tone(freq=440.0, sr=16000, dur=1.0, amp=0.3):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# --------------------------------------------------------------- audio

def test_decode_encode_roundtrip():
    x = np.array([-512, -1, 0, 1, 511], dtype=np.int64) / 1024.0
    raw = A.np_encode_linear16(x.astype(np.float32))
    back = A.np_decode_linear16(raw)
    assert np.allclose(back, x, atol=1 / 32768.0)


def test_resample_length_and_identity():
    x = _tone()
    # test_preprocessing.py:15-24: output length scales by sr ratio
    assert len(A.np_resample(x, 16000, 8000)) == 8000
    assert len(A.np_resample(x, 8000, 16000)) == 32000
    assert A.np_resample(x, 16000, 16000) is not None
    assert np.array_equal(A.np_resample(x, 16000, 16000), x)


def test_resample_2x_even_grid_exact():
    # even output indices coincide with input knots exactly (q52 oracle)
    x = (np.arange(100) % 1025 - 512).astype(np.float32) / 1024.0
    up = A.np_resample(x, 8000, 16000)
    assert np.array_equal(up[::2], x)


def test_to_mono():
    # test_preprocessing.py:26-34
    stereo = np.array([1.0, 3.0, 2.0, 4.0], dtype=np.float32)  # interleaved
    mono = A.np_to_mono(stereo, 2)
    assert np.array_equal(mono, np.array([2.0, 3.0], dtype=np.float32))


def test_normalize_bounds_and_target():
    # test_preprocessing.py:36-48: |y| <= 1 and RMS near target dBFS
    x = _tone(amp=0.9)
    y = A.np_normalize(x, target_dbfs=-20.0)
    assert np.max(np.abs(y)) <= 1.0
    rms = np.sqrt(np.mean(y.astype(np.float64) ** 2))
    assert abs(20 * np.log10(rms) - (-20.0)) < 1.0
    silence = np.zeros(100, dtype=np.float32)
    assert np.array_equal(A.np_normalize(silence), silence)


def test_agc_moves_amplitude_toward_target():
    # test_preprocessing.py:62-80: quiet audio is amplified
    x = _tone(amp=0.01)
    y = A.np_agc(x, target=0.1)
    assert np.max(np.abs(y[1600:])) > np.max(np.abs(x[1600:]))
    assert np.max(np.abs(y)) <= 1.0


def test_denoise_preserves_length():
    x = _tone()
    assert len(A.np_denoise(x)) == len(x)


def test_high_pass_removes_dc():
    x = (_tone() + 0.5).astype(np.float32)  # DC offset
    y = A.np_high_pass(x, cutoff=80.0, sr=16000)
    assert abs(np.mean(y[1000:-1000])) < 0.01


def test_vad_flags_silence_vs_speech():
    sr, frame = 16000, 480
    sig = np.concatenate([
        np.zeros(frame * 3, dtype=np.float32),
        _tone(dur=frame * 3 / sr),
        np.zeros(frame * 3, dtype=np.float32),
    ])
    flags = A.np_vad_flags(sig, sr=sr, frame_ms=30, threshold=0.01)
    assert flags.tolist() == [False] * 3 + [True] * 3 + [False] * 3


def test_features_shape_and_ranges():
    f = A.np_features(_tone(), sr=16000)
    assert set(f) == {"rms", "zcr", "centroid", "bandwidth", "rolloff"}
    assert 0 < f["rms"] < 1
    assert 0 <= f["rolloff"] <= 8000
    assert 300 < f["centroid"] < 600  # 440 Hz tone


def test_preprocess_pipeline_runs():
    y = A.np_preprocess(_tone(sr=8000, dur=0.5), orig_sr=8000)
    assert y.dtype == np.float32
    assert len(y) == 8000  # 0.5 s at 16 kHz
    assert np.max(np.abs(y)) <= 1.0


# --------------------------------------------------------------- image

def _block_image(w=200, h=150):
    img = np.full((h, w), 255, dtype=np.uint8)
    img[20:40, 30:90] = 40
    img[60:80, 10:60] = 40
    return img


def test_binarize_domain():
    # test_preprocessing.py:194-210: output strictly {0, 255}
    img = _block_image()
    for method in ("otsu", "adaptive", "fixed"):
        out = I.np_binarize(img, method=method)
        assert set(np.unique(out)) <= {0, 255}


def test_otsu_separates_bimodal():
    img = _block_image()
    t = I.np_otsu_threshold(img)
    assert 40 <= t < 255
    binary = I.np_binarize(img, "otsu")
    assert (binary == 0).sum() == (img == 40).sum()


def test_morph_open_removes_speck():
    # erode-then-dilate opening removes isolated bright specks
    img = np.zeros((20, 20), dtype=np.uint8)
    img[10, 10] = 255
    opened = I.np_morph_open(img)
    assert (opened == 255).sum() == 0
    # a large bright block survives opening with its interior intact
    img2 = np.zeros((20, 20), dtype=np.uint8)
    img2[5:15, 5:15] = 255
    opened2 = I.np_morph_open(img2)
    assert np.array_equal(opened2[6:14, 6:14], img2[6:14, 6:14])


def test_resize_nearest():
    img = _block_image()
    up = I.np_resize_nearest(img, 2.0)
    assert up.shape == (300, 400)
    down = I.np_resize_nearest(img, 0.5)
    assert down.shape == (75, 100)


def test_detect_layout_exact_geometry():
    img = _block_image()
    elems = I.np_detect_layout(img)
    assert [(e["x"], e["y"], e["width"], e["height"]) for e in elems] == [
        (30, 20, 60, 20),
        (10, 60, 50, 20),
    ]
    assert all(e["type"] == "block" for e in elems)
    # sorted top-to-bottom, left-to-right (image_processor.py:329)
    assert elems == sorted(elems, key=lambda e: (e["y"], e["x"]))


def test_crop_contains_content():
    # test_preprocessing.py:222-234
    img = _block_image()
    cropped = I.np_crop_to_content(img, padding=5)
    assert cropped.shape[0] <= img.shape[0]
    assert (cropped < I.WHITE).sum() == (img < I.WHITE).sum()


def test_validate_image():
    # test_preprocessing.py:254-277
    assert I.np_validate_image(_block_image()) == (True, "ok")
    blank = np.full((200, 200), 255, dtype=np.uint8)
    assert I.np_validate_image(blank) == (False, "blank")
    small = np.full((50, 200), 255, dtype=np.uint8)
    assert I.np_validate_image(small) == (False, "too_small")
    huge = np.full((101, 10001), 0, dtype=np.uint8)
    assert I.np_validate_image(huge) == (False, "too_large")


def test_bbox_from_quad():
    # ocr_worker.py:373-379
    quad = [(10.0, 5.0), (50.0, 6.0), (49.0, 25.0), (11.0, 24.0)]
    assert I.np_bbox_from_quad(quad) == (10, 5, 40, 20)


def test_decode_image_raw_and_stubs():
    img = _block_image()
    assert np.array_equal(I.decode_image(img.tobytes(), 200, 150), img)
    with pytest.raises(ValueError):
        I.decode_image(img.tobytes(), 10, 10)
    with pytest.raises(NotImplementedError):
        I.decode_image(b"\x89PNG", 1, 1, fmt="PNG")


def _striped_page(h: int = 160, w: int = 240) -> np.ndarray:
    """Synthetic text page: horizontal dark 'lines' every 16 px."""
    img = np.full((h, w), 255, dtype=np.uint8)
    for y0 in range(20, h - 20, 16):
        img[y0: y0 + 4, 20: w - 20] = 30
    return img


def test_deskew_recovers_known_rotation():
    page = _striped_page()
    skewed = I.np_rotate(page, 7.0)
    corrected, est = I.deskew(skewed)
    # PCA angle of the stripe cloud must see the injected skew...
    assert abs(est - 7.0) < 1.5
    # ...and correcting it must sharpen the projection profile back up
    assert I.np_profile_sharpness(corrected) > 2.0 * I.np_profile_sharpness(skewed)


def test_auto_rotate_maximizes_profile_sharpness():
    page = _striped_page()
    skewed = I.np_rotate(page, -5.5)
    corrected, applied = I.auto_rotate(skewed)
    assert abs(applied - 5.5) <= 1.0
    assert (
        I.np_profile_sharpness(corrected)
        >= 0.8 * I.np_profile_sharpness(page)
    )


def test_rotate_zero_is_identity_and_preserves_shape():
    page = _striped_page()
    assert np.array_equal(I.np_rotate(page, 0.0), page)
    assert I.np_rotate(page, 33.0).shape == page.shape


def test_fake_decode_deterministic():
    a = I.fake_decode("doc-1", 200, 150)
    b = I.fake_decode("doc-1", 200, 150)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, I.fake_decode("doc-2", 200, 150))


# ----------------------------------------------------------- inference

def test_mock_whisper_deterministic():
    x = _tone()
    r1, r2 = M.mock_whisper_transcribe(x), M.mock_whisper_transcribe(x)
    assert r1 == r2
    assert 0.0 <= r1["confidence"] <= 1.0
    assert r1["language"] == "en"
    assert r1["n_segments"] >= 1
    silent = M.mock_whisper_transcribe(np.zeros(16000, dtype=np.float32))
    assert silent["text"] == ""


def test_mock_paddleocr_one_line_per_block():
    img = _block_image()
    lines = M.mock_paddleocr(img)
    assert len(lines) == 2
    for line in lines:
        assert 0.5 <= line["confidence"] <= 1.0
        assert len(line["text"].split()) == 4


# ------------------------------------------------------- ops listener

def test_ops_metrics_listener(spark):
    from streamprocess_spark.streaming import metrics as OM
    from streamprocess_spark.streaming.core import events_stream, run_to_completion
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    listener = OM.attach(spark)
    try:
        stream, _ = events_stream(spark, SF_DIR)
        agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        result = run_to_completion(agg, "complete")
        assert result.count() == 5
        # listener callbacks are async; wait briefly for delivery
        import time
        for _ in range(40):
            if listener.metrics.batches:
                break
            time.sleep(0.25)
        s = listener.metrics.summary()
        assert s["n_batches"] >= 1
        assert s["total_input_rows"] > 0
        assert s["batch_ms_p99"] >= s["batch_ms_p50"] >= 0
        assert s["max_state_rows"] >= 5  # one state row per event_type
    finally:
        OM.detach(spark, listener)
