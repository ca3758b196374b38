"""Video-column operators (SURVEY §2.13 multimodal): treat video as an
opaque binary column with typed metadata, parse the container, sample
frames, and compute per-frame statistics — the Spark-side plumbing a
training-data pipeline needs for video corpora.

Two REAL containers over real bytes:

  - RAWV: trivial uncompressed format (header + back-to-back GRAY8
    rasters) — the minimal in-repo interchange format;
  - AVI/MJPEG: a real-world RIFF container (Microsoft AVI spec:
    LIST(hdrl){avih, strl{strh,strf}} + LIST(movi){00dc chunks} +
    idx1), each frame a whole baseline JPEG decoded by the repo's own
    T.81 codec (functions/jpeg.py — grayscale OR color) — so a real
    compressed video container now reaches the frame-dedup/sampling
    operators end-to-end with zero external codecs.

MP4/WebM (H.264/VP9 bitstreams) remain the documented stub: entropy-
coded inter-frame video needs a full codec (ffmpeg/pyav), absent in
this container — the reference itself shells out for exactly this
(stt_worker.py:381-394, ocr_worker.py:283-308).

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


# ---------------------------------------------------------------------------
# AVI / MJPEG container (RIFF)
# ---------------------------------------------------------------------------


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + len(body).to_bytes(4, "little") + body + pad


def _riff_list(fourcc: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", fourcc + body)


def np_build_avi_mjpeg(frames: list[bytes], width: int, height: int,
                       fps: int = 10) -> bytes:
    """Minimal spec-valid AVI wrapping per-frame JPEG payloads
    ('MJPG' vids stream, keyframe-only idx1)."""
    n = len(frames)
    if fps <= 0:
        raise ValueError("fps must be positive")
    us_per_frame = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)
    avih = b"".join(x.to_bytes(4, "little") for x in (
        us_per_frame, max_bytes * fps, 0, 0x10,        # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    ))
    strh = (b"vids" + b"MJPG"
            + (0).to_bytes(4, "little") * 3            # flags/prio/initial
            + (1).to_bytes(4, "little")                # scale
            + fps.to_bytes(4, "little")                # rate
            + (0).to_bytes(4, "little")                # start
            + n.to_bytes(4, "little")                  # length
            + max_bytes.to_bytes(4, "little")
            + (0xFFFFFFFF).to_bytes(4, "little")       # quality: default
            + (0).to_bytes(4, "little")                # sample size
            + (0).to_bytes(2, "little") * 4)           # rcFrame
    strf = (40).to_bytes(4, "little") + b"".join((     # BITMAPINFOHEADER
        width.to_bytes(4, "little"), height.to_bytes(4, "little"),
        (1).to_bytes(2, "little"), (24).to_bytes(2, "little"),
        b"MJPG", (width * height * 3).to_bytes(4, "little"),
        (0).to_bytes(4, "little") * 4,
    ))
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                     + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f)
                                        for f in frames))
    idx = bytearray()
    off = 4                                            # past 'movi' fourcc
    for f in frames:
        idx += b"00dc" + (0x10).to_bytes(4, "little")  # AVIIF_KEYFRAME
        idx += off.to_bytes(4, "little") + len(f).to_bytes(4, "little")
        off += 8 + len(f) + (len(f) % 2)
    riff_body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", bytes(idx))
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def np_demux_avi_mjpeg(raw: bytes) -> tuple[list[bytes], dict]:
    """Demux an MJPEG AVI → (JPEG frame payloads, stream info).
    Totality: every malformed container raises ValueError (ingest
    dead-letter boundary); non-MJPG codecs raise NotImplementedError."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    total = int.from_bytes(raw[4:8], "little")
    if 8 + total > len(raw):
        raise ValueError("truncated AVI container")
    frames: list[bytes] = []
    info: dict = {}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = raw[pos:pos + 4]
            size = int.from_bytes(raw[pos + 4:pos + 8], "little")
            body_at = pos + 8
            if body_at + size > end:
                raise ValueError(f"truncated AVI chunk {fourcc!r}")
            if fourcc == b"LIST":
                walk(body_at + 4, body_at + size)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("short avih header")
                info["us_per_frame"] = int.from_bytes(
                    raw[body_at:body_at + 4], "little")
                info["n_frames"] = int.from_bytes(
                    raw[body_at + 16:body_at + 20], "little")
                info["width"] = int.from_bytes(
                    raw[body_at + 32:body_at + 36], "little")
                info["height"] = int.from_bytes(
                    raw[body_at + 36:body_at + 40], "little")
            elif fourcc == b"strh":
                if size >= 8 and raw[body_at:body_at + 4] == b"vids":
                    info["codec"] = raw[body_at + 4:body_at + 8].decode(
                        "ascii", "replace")
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(raw[body_at:body_at + size])
            pos = body_at + size + (size % 2)

    walk(12, 8 + total)
    if info.get("codec") not in ("MJPG", "mjpg"):
        raise NotImplementedError(
            f"AVI codec {info.get('codec')!r}: only MJPG (H.264/VP9 "
            "etc. need ffmpeg, not present in this container)"
        )
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames, info


def np_parse_avi_mjpeg(raw: bytes) -> tuple[np.ndarray, int]:
    """AVI/MJPEG → ((nf, h, w) uint8 luma frames, fps): demux, then
    decode every JPEG through the repo's own baseline codec (color
    frames yield their Y plane — same convention as the OCR path)."""
    from streamprocess_spark.functions.jpeg import np_decode_jpeg_gray

    payloads, info = np_demux_avi_mjpeg(raw)
    imgs = [np_decode_jpeg_gray(p) for p in payloads]
    shape0 = imgs[0].shape
    if any(i.shape != shape0 for i in imgs):
        raise ValueError("AVI frames disagree on dimensions")
    fps = 1_000_000 // info["us_per_frame"] if info.get("us_per_frame") else 0
    return np.stack(imgs), fps


def np_decode_video(raw: bytes, fmt: str = "RAWV") -> tuple[np.ndarray, int]:
    """Container dispatch. RAWV, AVI/MJPG, MP4/'jpeg' and
    Matroska/WebM V_MJPEG decode for real; non-MJPEG codecs inside
    those containers are the documented per-codec stub."""
    if fmt == "RAWV":
        return np_parse_rawv(raw)
    if fmt == "AVI":
        return np_parse_avi_mjpeg(raw)
    if fmt == "MP4":
        from streamprocess_spark.functions.mp4 import np_parse_mp4_jpeg

        return np_parse_mp4_jpeg(raw)
    if fmt in ("MKV", "WEBM"):
        from streamprocess_spark.functions.matroska import np_parse_mkv_mjpeg

        return np_parse_mkv_mjpeg(raw)
    raise NotImplementedError(
        f"video decode for {fmt} needs a codec library (ffmpeg/pyav), "
        "not present in this container"
    )


def np_sample_frames(raw: bytes, step: int = 2,
                     fmt: str = "RAWV") -> list[dict]:
    """Every step-th frame with exact integer stats: luma_sum (bit-for-
    bit reproducible — no float mean), and motion = |luma_sum delta| vs
    the previously sampled frame (a scene-change / activity signal)."""
    frames, _fps = np_decode_video(raw, fmt)
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


def sample_frames_udf(step: int = 2, fmt: str = "RAWV"):
    @pandas_udf(FRAME_SCHEMA)
    def _udf(video: pd.Series) -> pd.Series:
        return video.apply(lambda raw: np_sample_frames(raw, step, fmt))
    return _udf
