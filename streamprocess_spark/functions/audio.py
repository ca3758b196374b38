"""Audio scalar-function library (SURVEY §2.10 F1-F10) as Arrow
pandas UDFs over array<float> / binary columns.

Reference semantics from src/preprocessing/audio_processor.py; all
implementations are pure NumPy (librosa/scipy/webrtcvad are not in
this container). The scipy/librosa kernels are re-derived from the
public math in functions/dsp.py; remaining deviations noted inline:
  F1  resample            (:70-82)   Kaiser-sinc (librosa family,
                                      dsp.np_resample_kaiser) in the
                                      preprocess chain; linear-interp
                                      np_resample retained for the
                                      closed-form-oracled decode legs
  F2  to_mono             (:84-91)   channel mean
  F3  normalize_audio     (:93-114)  RMS→dBFS gain, clipped
  F4  denoise             (:116-157) spectral subtraction α=2 β=0.01
                                      at the real STFT geometry
                                      (hann 2048/512, noise gate)
  F5  high_pass_filter    (:159-180) true 4th-order Butterworth
                                      filtfilt (dsp.py design)
  F6  apply_agc           (:182-215) attack/release gain smoothing
  F7  apply_vad           (:217-278) frame-energy VAD (vs webrtcvad —
                                      its GMM tables aren't derivable
                                      offline; documented analog)
  F8  extract_features    (:384-420) per-frame MFCC/centroid/
                                      bandwidth/rolloff/ZCR/RMS at the
                                      librosa construction (dsp.np_mfcc,
                                      dsp.np_frame_features); np_features
                                      keeps the scalar summary for the
                                      oracle-banded q59 leg; beat
                                      tracking via the published
                                      Ellis-2007 DP algorithm
                                      (dsp.np_beat_track)
  F9  decode LINEAR16     (stt_worker.py:381-394) int16/32768
  F10 preprocess pipeline (:20-68)

Performance: every UDF is vectorized over Arrow batches (one Python
call per ~10k rows, spark.sql.execution.arrow.maxRecordsPerBatch); at
100 TB these run embarrassingly parallel per-row with zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EPS = 1e-10


# ---------------------------------------------------------------------------
# numpy cores (unit-testable without Spark)
# ---------------------------------------------------------------------------

def np_decode_linear16(raw: bytes) -> np.ndarray:
    """F9: PCM16LE bytes → float32 in [-1, 1) (stt_worker.py:387-389)."""
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0


def np_encode_linear16(x: np.ndarray) -> bytes:
    return (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


def np_build_wav(pcm16: bytes, sr: int = 16000, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE PCM16 container writer — the hand-built WAV
    fixture the reference's own tests construct (tests/conftest.py:
    107-146 there). Used by fixtures/tests to exercise np_parse_wav."""
    byte_rate = sr * channels * 2
    block_align = channels * 2
    fmt = (
        (1).to_bytes(2, "little")          # PCM
        + channels.to_bytes(2, "little")
        + sr.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")       # bits per sample
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm16).to_bytes(4, "little") + pcm16
    if len(pcm16) & 1:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def np_parse_wav(raw: bytes) -> tuple[np.ndarray, int, int]:
    """S15 WAV decode, dependency-free: walk the RIFF chunk list, read
    `fmt ` + `data`, decode PCM16 (fmt 1) or the G.711 telephony
    encodings A-law (fmt 6) / µ-law (fmt 7) through the existing
    expanders (the reference decodes WAV via soundfile,
    stt_worker.py:381-394; accepted encodings
    protos/stream_process.proto:75-81). Returns (float32 samples,
    sample_rate, channels); samples stay interleaved — compose with
    np_to_mono for the mono path."""
    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    sr = channels = fmt_tag = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            sr = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt_tag == 1 and bits != 16:
                raise ValueError(f"only 16-bit PCM WAV (bits={bits})")
            if fmt_tag in (6, 7) and bits not in (0, 8):
                raise ValueError(f"G.711 WAV must be 8-bit (bits={bits})")
            if fmt_tag not in (1, 6, 7):
                raise ValueError(
                    f"WAV fmt {fmt_tag} unsupported (PCM16/A-law/mu-law)"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_tag == 6:                               # G.711 A-law
        return np_decode_alaw(data), sr, channels or 1
    if fmt_tag == 7:                               # G.711 µ-law
        return np_decode_mulaw(data), sr, channels or 1
    x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    return x.astype(np.float32) / 32768.0, sr, channels or 1


def np_decode_mulaw(raw: bytes) -> np.ndarray:
    """G.711 µ-law decode (telephony 8-bit companding) → float32 in
    [-1, 1). Standard ITU-T expansion: invert bits, split
    sign/exponent/mantissa, magnitude = ((2m+33) << e) - 33, scaled by
    the 14-bit full scale (8159)."""
    u = ~np.frombuffer(raw, dtype=np.uint8)
    sign = (u & 0x80) != 0
    exp = ((u >> 4) & 0x07).astype(np.int32)
    mant = (u & 0x0F).astype(np.int32)
    mag = ((2 * mant + 33) << exp) - 33
    x = np.where(sign, -mag, mag).astype(np.float32) / 8159.0
    return np.clip(x, -1.0, 1.0)


def np_encode_mulaw(x: np.ndarray) -> bytes:
    """G.711 µ-law encode (inverse of np_decode_mulaw)."""
    mag = np.clip(np.abs(x) * 8159.0, 0, 8158).astype(np.int32) + 33
    exp = (np.floor(np.log2(mag)) - 5).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = ((mag >> (exp + 1)) - 16) & 0x0F
    u = (exp << 4) | mant
    u = np.where(np.signbit(x) | (x < 0), u | 0x80, u)
    return (~u.astype(np.uint8)).tobytes()


def np_decode_alaw(raw: bytes) -> np.ndarray:
    """G.711 A-law decode → float32 in [-1, 1). ITU-T expansion with
    the 0x55 XOR mask; 13-bit full scale (4032)."""
    a = np.frombuffer(raw, dtype=np.uint8) ^ 0x55
    # sign bit SET means positive in A-law (opposite of µ-law)
    pos = (a & 0x80) != 0
    exp = ((a >> 4) & 0x07).astype(np.int32)
    mant = (a & 0x0F).astype(np.int32)
    mag = np.where(exp == 0, 2 * mant + 1, (2 * mant + 33) << (exp - 1))
    x = np.where(pos, mag, -mag).astype(np.float32) / 4032.0
    return np.clip(x, -1.0, 1.0)


def np_decode_audio(
    raw: bytes, encoding: str = "LINEAR16", target_sr: int = 16000
) -> np.ndarray:
    """F9/S15 encoding dispatch (stt_worker.py:381-394): LINEAR16 and
    WAV decode natively; compressed codecs need a decoder library not
    present in this container.

    WAV honors the container's actual sample rate: decode → mono →
    resample(parsed sr → target_sr), exactly the reference decode path
    (soundfile read + resample to 16 kHz). LINEAR16 is a headerless
    stream the protocol defines as already being at the session rate
    (protos/stream_process.proto:75-81), so it passes through."""
    enc = encoding.upper()
    if enc == "LINEAR16":
        return np_decode_linear16(raw)
    if enc == "WAV":
        x, sr, ch = np_parse_wav(raw)
        return np_resample(np_to_mono(x, ch), sr, target_sr)
    if enc in ("MULAW", "ULAW"):
        # G.711 is defined at 8 kHz — resample to the pipeline rate
        return np_resample(np_decode_mulaw(raw), 8000, target_sr)
    if enc == "ALAW":
        return np_resample(np_decode_alaw(raw), 8000, target_sr)
    if enc == "FLAC":
        from streamprocess_spark.functions.flac import np_decode_flac

        x, sr, ch = np_decode_flac(raw)
        return np_resample(np_to_mono(x, ch), sr, target_sr)
    raise NotImplementedError(
        f"audio decode for {enc} needs a codec library (soundfile/ffmpeg); "
        "the reference decodes via soundfile (stt_worker.py:390-394). "
        "For MP3/MP2/MP1 the container layer (sync walk, header fields, "
        "exact duration, ID3) IS implemented — functions/mpeg_audio.py; "
        "only PCM reconstruction is out of reach (the subband synthesis "
        "window is normative tabulated data, ISO 11172-3 Table 3-B.3, "
        "with no closed form to derive offline). Same for OPUS: the "
        "Ogg container layer (page walk, CRC, OpusHead, TOC duration) "
        "IS implemented — functions/ogg_opus.py — but SILK/CELT PCM "
        "needs RFC 6716's tabulated codebooks."
    )


def np_resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """F1: linear-interpolation resample (audio_processor.py:70-82)."""
    if orig_sr == target_sr or len(x) == 0:
        return x.astype(np.float32)
    n_out = int(round(len(x) * target_sr / orig_sr))
    src_t = np.arange(len(x), dtype=np.float64) / orig_sr
    dst_t = np.arange(n_out, dtype=np.float64) / target_sr
    return np.interp(dst_t, src_t, x.astype(np.float64)).astype(np.float32)


def np_to_mono(x: np.ndarray, channels: int) -> np.ndarray:
    """F2: interleaved multi-channel → mean (audio_processor.py:84-91)."""
    if channels <= 1:
        return x.astype(np.float32)
    n = len(x) // channels * channels
    return x[:n].reshape(-1, channels).mean(axis=1).astype(np.float32)


def np_normalize(x: np.ndarray, target_dbfs: float = -20.0) -> np.ndarray:
    """F3: RMS→dBFS gain with clip (audio_processor.py:93-114)."""
    rms = float(np.sqrt(np.mean(np.square(x, dtype=np.float64)))) if len(x) else 0.0
    if rms < EPS:
        return x.astype(np.float32)
    gain = 10.0 ** (target_dbfs / 20.0) / rms
    return np.clip(x * gain, -1.0, 1.0).astype(np.float32)


def np_denoise(x: np.ndarray, sr: int = 16000, alpha: float = 2.0,
               beta: float = 0.01) -> np.ndarray:
    """F4: spectral subtraction at the reference's real STFT geometry
    (audio_processor.py:116-157): hann STFT win=2048 hop=512, noise
    spectrum from the first min(0.5 s, len/4) samples (skipped below
    1024 samples — the reference's gate), subtract α·noise, floor
    β·magnitude, overlap-add resynthesis with the original phase,
    np.resize back to the input length. STFT/iSTFT re-derived in
    functions/dsp.py (librosa construction)."""
    from streamprocess_spark.functions.dsp import np_spectral_subtract

    return np_spectral_subtract(x, sr=sr, alpha=alpha, beta=beta)


def np_high_pass(x: np.ndarray, cutoff: float = 80.0,
                 sr: int = 16000) -> np.ndarray:
    """F5: 4th-order digital Butterworth high-pass applied zero-phase
    via filtfilt — the reference kernel (audio_processor.py:159-180,
    scipy.signal.butter + filtfilt), re-derived from the public math
    in functions/dsp.py (design checked against the analytic bilinear
    Butterworth response; application by cached truncated impulse
    response + FFT convolution, vectorized)."""
    if len(x) == 0:
        return x.astype(np.float32)
    from streamprocess_spark.functions.dsp import np_butter_highpass_filtfilt

    return np_butter_highpass_filtfilt(
        np.asarray(x, dtype=np.float64), cutoff=cutoff, sr=sr, order=4
    )


def np_agc(x: np.ndarray, target: float = 0.1, attack: float = 0.1,
           release: float = 0.9, frame: int = 160) -> np.ndarray:
    """F6: automatic gain control with attack/release smoothing at
    frame granularity (audio_processor.py:182-215)."""
    if len(x) == 0:
        return x.astype(np.float32)
    n_frames = (len(x) + frame - 1) // frame
    out = np.empty(len(x), dtype=np.float64)
    gain = 1.0
    for i in range(n_frames):
        seg = x[i * frame: (i + 1) * frame].astype(np.float64)
        amp = np.max(np.abs(seg)) if len(seg) else 0.0
        desired = target / amp if amp > EPS else gain
        coef = attack if desired < gain else release
        gain = coef * gain + (1.0 - coef) * desired
        out[i * frame: i * frame + len(seg)] = seg * gain
    return np.clip(out, -1.0, 1.0).astype(np.float32)


def np_vad_flags(x: np.ndarray, sr: int = 16000, frame_ms: int = 30,
                 threshold: float = 0.01) -> np.ndarray:
    """F7: per-frame speech flags by RMS energy (frame cadence follows
    audio_processor.py:217-278; webrtcvad → energy threshold).

    Numeric-parity boundary (same sourcing protocol as the MP3 note,
    functions/mpeg_audio.py:18-31): the reference's webrtcvad is a
    trained two-class GMM over six sub-band log-energy features; its
    decision surface is defined by the shipped model constants
    (weights/means/variances in the WebRTC sources' vad_core tables),
    i.e. TRAINED TABULATED data, not formulas. The retrieved public
    content (PAPERS.md / SNIPPETS.md) carries no WebRTC material —
    searched round 6 and re-searched round 7 (case-insensitive grep
    for webrtc / vad / "voice activity" / gmm over both files: zero
    hits) — so a from-scratch reimplementation
    could not be numerically validated against anything. The energy
    VAD keeps the reference's exact frame cadence and accept/reject
    contract and is the documented analog; the sessionizer's T2/T4
    state machines consume only the boolean flags, so swapping in a
    bit-parity VAD would not change any downstream semantics."""
    frame = max(1, sr * frame_ms // 1000)
    n_frames = len(x) // frame
    if n_frames == 0:
        return np.zeros(0, dtype=bool)
    frames = x[: n_frames * frame].astype(np.float64).reshape(n_frames, frame)
    rms = np.sqrt(np.mean(frames ** 2, axis=1))
    return rms > threshold


def np_features(x: np.ndarray, sr: int = 16000) -> dict[str, float]:
    """F8: summary spectral features (audio_processor.py:384-420) as
    scalars for the banded q59 invariants. The reference's per-frame
    forms — MFCC and the frame-grid centroid/bandwidth/rolloff/ZCR/RMS
    — are reproduced at the librosa construction in functions/dsp.py
    (np_mfcc, np_frame_features; q_dsp_parity 'dsp_mfcc' rows), and
    beat tracking by the Ellis-2007 DP algorithm (np_beat_track,
    'dsp_beat' rows)."""
    if len(x) == 0:
        return {"rms": 0.0, "zcr": 0.0, "centroid": 0.0,
                "bandwidth": 0.0, "rolloff": 0.0}
    xd = x.astype(np.float64)
    rms = float(np.sqrt(np.mean(xd ** 2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(xd)).astype(np.float64))))
    mag = np.abs(np.fft.rfft(xd))
    freqs = np.fft.rfftfreq(len(xd), d=1.0 / sr)
    total = mag.sum() + EPS
    centroid = float((freqs * mag).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total))
    cum = np.cumsum(mag)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * cum[-1]))])
    return {"rms": rms, "zcr": zcr, "centroid": centroid,
            "bandwidth": bandwidth, "rolloff": rolloff}


def np_preprocess(x: np.ndarray, orig_sr: int, channels: int = 1,
                  target_sr: int = 16000, denoise: bool = False) -> np.ndarray:
    """F10: resample→mono→normalize→(denoise)→HPF→AGC composition
    (audio_processor.py:20-68). The resample leg uses the Kaiser-sinc
    parity kernel (librosa.resample family, functions/dsp.py); the
    ingest/decode paths keep linear interp where the oracle replays
    it in closed form (q52/q_audio_suite)."""
    from streamprocess_spark.functions.dsp import np_resample_kaiser

    y = np_to_mono(x, channels)
    y = np_resample_kaiser(y, orig_sr, target_sr)
    y = np_normalize(y)
    if denoise:
        y = np_denoise(y)
    y = np_high_pass(y, sr=target_sr)
    y = np_agc(y)
    return y


# ---------------------------------------------------------------------------
# pandas UDF wrappers (Arrow-vectorized). Array columns return numpy
# arrays directly — pyarrow converts ndarray elements ~10x faster than
# Python lists (measured 2.5 s/5k clips round-trip saved in q50), with
# identical values (same float32 bits either path).
# ---------------------------------------------------------------------------

@pandas_udf(T.ArrayType(T.FloatType()))
def decode_linear16_udf(raw: pd.Series) -> pd.Series:
    return raw.apply(lambda b: np_decode_linear16(b) if b is not None else None)


AUDIO_FP_STATS_SCHEMA = T.StructType([
    T.StructField("n_samples", T.LongType()),
    T.StructField("ssum_fp", T.LongType()),
    T.StructField("sabs_fp", T.LongType()),
])


@pandas_udf(AUDIO_FP_STATS_SCHEMA)
def linear16_fp_stats_udf(raw: pd.Series) -> pd.DataFrame:
    """Decode LINEAR16 and emit the µ-fixed-point content sums in ONE
    Arrow pass. The previous q50 shape decoded here, shipped the
    ~6.7k-float sample array to the JVM, and summed with aggregate()
    HOFs — but Spark HOFs are CodegenFallback (interpreted lambda per
    element), so two sums over 33M samples at sf0.1 cost ~6 s and
    dwarfed the 0.1 s decode. floor(float64(x) * 1e6) -> int64 and the
    integer sum are the same IEEE/two's-complement ops in numpy and in
    the JVM expression, so the emitted integers are bit-identical to
    the HOF form and the DuckDB oracle is unchanged (the established
    Arrow-scorer equivalence, operators/similarity.py)."""
    out = {"n_samples": [], "ssum_fp": [], "sabs_fp": []}
    for b in raw:
        if b is None:  # null payload -> null stats, same as the
            out["n_samples"].append(None)  # guarded decode UDFs
            out["ssum_fp"].append(None)
            out["sabs_fp"].append(None)
            continue
        x = np_decode_linear16(b).astype(np.float64)
        fp = np.floor(x * 1e6).astype(np.int64)
        afp = np.floor(np.abs(x) * 1e6).astype(np.int64)
        out["n_samples"].append(x.size)
        out["ssum_fp"].append(int(fp.sum()))
        out["sabs_fp"].append(int(afp.sum()))
    return pd.DataFrame(out)


def decode_audio_udf(encoding: str = "LINEAR16", target_sr: int = 16000):
    """S15 decode with encoding dispatch (LINEAR16 | WAV); WAV is
    resampled from its parsed container rate to target_sr."""
    @pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(raw: pd.Series) -> pd.Series:
        return raw.apply(
            lambda b: np_decode_audio(b, encoding, target_sr)
            if b is not None else None
        )
    return _udf


def resample_udf(orig_sr: int, target_sr: int):
    @pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(samples: pd.Series) -> pd.Series:
        return samples.apply(
            lambda a: np_resample(np.asarray(a, dtype=np.float32), orig_sr, target_sr)
        )
    return _udf


def normalize_udf(target_dbfs: float = -20.0):
    @pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(samples: pd.Series) -> pd.Series:
        return samples.apply(
            lambda a: np_normalize(
                np.asarray(a, dtype=np.float32), target_dbfs
            )
        )
    return _udf


def to_mono_udf(channels: int = 2):
    @pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(samples: pd.Series) -> pd.Series:
        return samples.apply(
            lambda a: np_to_mono(np.asarray(a, dtype=np.float32), channels)
        )
    return _udf


FEATURE_SCHEMA = T.StructType([
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("centroid", T.DoubleType()),
    T.StructField("bandwidth", T.DoubleType()),
    T.StructField("rolloff", T.DoubleType()),
])


def features_udf(sr: int = 16000):
    @pandas_udf(FEATURE_SCHEMA)
    def _udf(samples: pd.Series) -> pd.DataFrame:
        rows = [np_features(np.asarray(a, dtype=np.float32), sr) for a in samples]
        return pd.DataFrame(rows)
    return _udf


def vad_udf(sr: int = 16000, frame_ms: int = 30, threshold: float = 0.01):
    @pandas_udf(T.ArrayType(T.BooleanType()))
    def _udf(samples: pd.Series) -> pd.Series:
        return samples.apply(
            lambda a: np_vad_flags(
                np.asarray(a, dtype=np.float32), sr, frame_ms, threshold
            )
        )
    return _udf


def preprocess_udf(orig_sr: int, target_sr: int = 16000, denoise: bool = False):
    @pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(samples: pd.Series) -> pd.Series:
        return samples.apply(
            lambda a: np_preprocess(
                np.asarray(a, dtype=np.float32), orig_sr, 1, target_sr, denoise
            )
        )
    return _udf


MFCC_SCHEMA = T.StructType([
    T.StructField("n_frames", T.LongType()),
    T.StructField("mfcc_mean", T.ArrayType(T.DoubleType())),
    T.StructField("centroid_mean", T.DoubleType()),
    T.StructField("rolloff_mean", T.DoubleType()),
    T.StructField("zcr_mean", T.DoubleType()),
    T.StructField("rms_mean", T.DoubleType()),
])


def frame_features_udf(sr: int = 16000):
    """F8 per-frame feature surface at the librosa construction
    (dsp.np_mfcc + dsp.np_frame_features): frame-grid size, the
    13-coefficient MFCC mean vector, and frame-mean spectral stats."""
    from streamprocess_spark.functions.dsp import np_frame_features, np_mfcc

    @pandas_udf(MFCC_SCHEMA)
    def _udf(samples: pd.Series) -> pd.DataFrame:
        rows = []
        for a in samples:
            x = np.asarray(a, dtype=np.float32)
            m = np_mfcc(x, sr)
            f = np_frame_features(x, sr)
            rows.append({
                "n_frames": m.shape[1],
                "mfcc_mean": m.mean(axis=1),
                "centroid_mean": float(np.mean(f["centroid"])),
                "rolloff_mean": float(np.mean(f["rolloff"])),
                "zcr_mean": float(np.mean(f["zcr"])),
                "rms_mean": float(np.mean(f["rms"])),
            })
        return pd.DataFrame(rows)

    return _udf


BEAT_SCHEMA = T.StructType([
    T.StructField("tempo_bpm", T.DoubleType()),
    T.StructField("n_beats", T.LongType()),
    T.StructField("beat_frames", T.ArrayType(T.LongType())),
])


def beat_track_udf(sr: int = 16000):
    """F8 beat tracking surface (dsp.np_beat_track, Ellis 2007 DP)."""
    from streamprocess_spark.functions.dsp import np_beat_track

    @pandas_udf(BEAT_SCHEMA)
    def _udf(samples: pd.Series) -> pd.DataFrame:
        rows = []
        for a in samples:
            tempo, beats = np_beat_track(
                np.asarray(a, dtype=np.float32), sr=sr
            )
            rows.append({
                "tempo_bpm": float(tempo),
                "n_beats": len(beats),
                "beat_frames": beats,
            })
        return pd.DataFrame(rows)

    return _udf
