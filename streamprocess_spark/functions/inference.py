"""Model-inference boundary (SURVEY §2.10 F24-F27) behind a pluggable
interface with deterministic mocks — exactly the reference's own test
strategy (tests/conftest.py:168-200 mocks Whisper/PaddleOCR).

The real path on a cluster: broadcast model weights once per executor
and run batched inference inside a pandas UDF (predict_batch_udf
pattern); the mock keeps the identical dataflow shape (bucketed,
padded, Arrow-batched) so the pipeline is benchmarkable without GPUs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from streamprocess_spark.functions.audio import np_vad_flags

_WORDS = (
    "hello world stream process audio text spark data batch window "
    "session partial final decode merge"
).split()


def mock_whisper_transcribe(samples: np.ndarray, sr: int = 16000,
                            beam_size: int = 5) -> dict:
    """F24 mock: deterministic 'transcription' — one word per speech
    frame island, confidence from energy (mirrors the shape of
    stt_worker.py:201-212 output; conftest.py:168-185 returns a fixed
    'Hello world' — ours varies deterministically with content)."""
    flags = np_vad_flags(samples, sr=sr, frame_ms=30, threshold=0.005)
    islands = int(np.sum(np.diff(np.concatenate([[0], flags.view(np.int8)])) == 1))
    h = hashlib.md5(samples.tobytes()).digest()
    n_words = max(1, islands) if flags.any() else 0
    words = [
        _WORDS[(h[i % len(h)] + i) % len(_WORDS)] for i in range(min(n_words, 12))
    ]
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
    # F27: clip(1 + avg_logprob, 0, 1) (src/stt/service.py:155)
    avg_logprob = -min(1.0, max(0.0, 0.5 - rms))
    confidence = max(0.0, min(1.0, 1.0 + avg_logprob))
    return {
        "text": " ".join(words),
        "language": "en",
        "confidence": round(confidence, 6),
        "n_segments": max(1, islands) if len(samples) else 0,
    }


def mock_paddleocr(img: np.ndarray) -> list[dict]:
    """F25 mock: one OCR 'line' per detected layout block, text seeded
    by block geometry (conftest.py:188-200 returns one fixed quad)."""
    from streamprocess_spark.functions.image import np_detect_layout

    blocks = np_detect_layout(img)
    out = []
    for i, b in enumerate(blocks):
        h = hashlib.md5(f"{b['x']},{b['y']},{b['width']},{b['height']}".encode()).digest()
        text = " ".join(
            _WORDS[(h[j] + i) % len(_WORDS)] for j in range(min(4, len(h)))
        )
        conf = 0.5 + (h[0] % 50) / 100.0
        out.append({
            "text": text, "confidence": round(conf, 4),
            "x": b["x"], "y": b["y"],
            "width": b["width"], "height": b["height"],
        })
    return out


def mock_tesseract(img: np.ndarray) -> list[dict]:
    """F26 mock: a DISTINCT second OCR engine behind the same boundary
    (src/ocr/service.py:275-360 image_to_data; Go gosseract
    cmd/ocr-worker/main.go:159-240). Differs from the PaddleOCR mock in
    both text derivation (odd md5 bytes, 3i stride, 2 words/line) and
    confidence model (60-99 integer percent, tesseract-style), so an
    engine-selection column observably switches backends."""
    from streamprocess_spark.functions.image import np_detect_layout

    blocks = np_detect_layout(img)
    out = []
    for i, b in enumerate(blocks):
        h = hashlib.md5(
            f"{b['x']},{b['y']},{b['width']},{b['height']}".encode()
        ).digest()
        text = " ".join(
            _WORDS[(h[2 * j + 1] + 3 * i) % len(_WORDS)] for j in range(2)
        )
        conf = (60 + h[1] % 40) / 100.0
        out.append({
            "text": text, "confidence": round(conf, 4),
            "x": b["x"], "y": b["y"],
            "width": b["width"], "height": b["height"],
        })
    return out


_OCR_ENGINES = {"paddle": mock_paddleocr, "tesseract": mock_tesseract}


TRANSCRIBE_SCHEMA = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("language", T.StringType()),
    T.StructField("confidence", T.DoubleType()),
    T.StructField("n_segments", T.IntegerType()),
])


def transcribe_udf(sr: int = 16000):
    @pandas_udf(TRANSCRIBE_SCHEMA)
    def _udf(samples: pd.Series) -> pd.DataFrame:
        rows = [
            mock_whisper_transcribe(np.asarray(a, dtype=np.float32), sr)
            for a in samples
        ]
        return pd.DataFrame(rows)
    return _udf


OCR_LINE_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("confidence", T.DoubleType()),
    T.StructField("x", T.IntegerType()),
    T.StructField("y", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
]))


@pandas_udf(OCR_LINE_SCHEMA)
def ocr_udf(image: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    from streamprocess_spark.functions.image import decode_image

    out = []
    for raw, w, h in zip(image, width, height):
        out.append(mock_paddleocr(decode_image(raw, int(w), int(h))))
    return pd.Series(out)


@pandas_udf(OCR_LINE_SCHEMA)
def ocr_engine_udf(
    image: pd.Series, width: pd.Series, height: pd.Series, engine: pd.Series
) -> pd.Series:
    """F25/F26 with per-request engine selection — the reference picks
    the OCR backend per request (src/ocr/service.py:275-360); unknown
    engines fall back to paddle, mirroring its default."""
    from streamprocess_spark.functions.image import decode_image

    out = []
    for raw, w, h, eng in zip(image, width, height, engine):
        fn = _OCR_ENGINES.get(str(eng), mock_paddleocr)
        out.append(fn(decode_image(raw, int(w), int(h))))
    return pd.Series(out)
