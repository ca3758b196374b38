"""Video-column operators (SURVEY §2.13 multimodal): treat video as an
opaque binary column with typed metadata, parse the container, sample
frames, and compute per-frame statistics — the Spark-side plumbing a
training-data pipeline needs for video corpora.

The container here is RAWV, a trivial uncompressed format (header +
back-to-back GRAY8 rasters): a REAL parser over real bytes, standing
in for MP4/WebM the way the reference's media decode stands behind
soundfile/cv2 (stt_worker.py:381-394, ocr_worker.py:283-308). Real
codecs need ffmpeg, absent in this container — the decode boundary is
the documented stub (np_decode_video raises for them); everything
downstream of the decode (schema, frame sampling, batch shape, stats)
is the production path.

Scale: frame sampling is a per-row map (zero shuffle); one video row
expands to ceil(n_frames/step) frame rows via posexplode — at 100 TB
the expansion happens inside the scan partition, never materializing
whole videos across the wire more than once.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MAGIC = b"RAWV"
HEADER = struct.Struct("<4sIIII")  # magic, width, height, n_frames, fps


def np_build_rawv(frames: np.ndarray, fps: int = 10) -> bytes:
    """(nf, h, w) uint8 frames → RAWV container bytes."""
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("np_build_rawv expects (nf, h, w) uint8")
    nf, h, w = frames.shape
    return HEADER.pack(MAGIC, w, h, nf, fps) + frames.tobytes()


def np_parse_rawv(raw: bytes) -> tuple[np.ndarray, int]:
    """RAWV bytes → ((nf, h, w) uint8 frames, fps)."""
    if len(raw) < HEADER.size:
        raise ValueError("not a RAWV container (too short)")
    magic, w, h, nf, fps = HEADER.unpack_from(raw, 0)
    if magic != MAGIC:
        raise ValueError("not a RAWV container (bad magic)")
    need = HEADER.size + nf * h * w
    if len(raw) < need:
        raise ValueError(f"RAWV truncated: {len(raw)} < {need}")
    frames = np.frombuffer(raw, dtype=np.uint8, count=nf * h * w,
                           offset=HEADER.size).reshape(nf, h, w)
    return frames, fps


def np_decode_video(raw: bytes, fmt: str = "RAWV") -> tuple[np.ndarray, int]:
    """Container dispatch. Real codecs are the documented stub."""
    if fmt == "RAWV":
        return np_parse_rawv(raw)
    raise NotImplementedError(
        f"video decode for {fmt} needs a codec library (ffmpeg/pyav), "
        "not present in this container"
    )


def np_sample_frames(raw: bytes, step: int = 2) -> list[dict]:
    """Every step-th frame with exact integer stats: luma_sum (bit-for-
    bit reproducible — no float mean), and motion = |luma_sum delta| vs
    the previously sampled frame (a scene-change / activity signal)."""
    frames, _fps = np_parse_rawv(raw)
    out = []
    prev_sum = None
    for f in range(0, frames.shape[0], step):
        s = int(frames[f].astype(np.int64).sum())
        out.append({
            "frame_idx": f,
            "luma_sum": s,
            "motion": abs(s - prev_sum) if prev_sum is not None else None,
        })
        prev_sum = s
    return out


FRAME_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("luma_sum", T.LongType()),
    T.StructField("motion", T.LongType()),
]))


def sample_frames_udf(step: int = 2):
    @pandas_udf(FRAME_SCHEMA)
    def _udf(video: pd.Series) -> pd.Series:
        return video.apply(lambda raw: np_sample_frames(raw, step))
    return _udf
