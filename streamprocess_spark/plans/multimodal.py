"""Multimodal UDF-pipeline queries (SURVEY §2.10, §3.2-3.3): the audio
decode→VAD→transcribe path and the image decode→validate→layout→OCR
path, run through the real Arrow pandas-UDF plumbing with
oracle-checkable outputs.

The testdata tables carry no binary columns, so each query synthesizes
its payloads deterministically from `doc_id` with pure modular
arithmetic (one numpy-vectorized pandas UDF per modality), then runs
the actual engine UDFs (functions.audio / functions.image /
functions.inference) over them. The DuckDB oracle never touches bytes:
it recomputes the expected outputs from the same integer formulas
(and, for the OCR mock, the same md5 both engines expose).

Determinism design:
  - audio samples are dyadic rationals k/1024 (|k| <= 512) → exact in
    float32/float64, so floor(x*1e6) fixed-point images are identical
    across numpy, Spark SQL expressions, and DuckDB.
  - silence is whole frames of exact zeros, and speech frames have RMS
    ≈ 0.29 vs the 0.01 VAD threshold — a 29× margin, so no ulp flip
    can change a flag.
  - image geometry is integer; layout blocks live in disjoint
    horizontal bands so projection-profile detection recovers the
    exact (x, y, w, h) that the formula placed.
  - mock-OCR text/confidence derive from md5 of the block geometry
    string; DuckDB's md5() reproduces them bit-for-bit.

Scale: every query is a per-row transform (zero or tiny shuffles);
at 100 TB these parallelize embarrassingly over input splits, with
Arrow-batched UDFs (spark.sql.execution.arrow.maxRecordsPerBatch)
keeping the Python boundary amortized.

Reference parity: audio path mirrors src/workers/stt_worker.py:381-394
(decode) + src/preprocessing/audio_processor.py:217-278 (VAD) +
stt_worker.py:201-212 (transcribe); image path mirrors
src/workers/ocr_worker.py:283-410 (load→preprocess→OCR→blocks) and
src/preprocessing/image_processor.py:288-335,422-446.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from streamprocess_spark.functions.audio import (
    decode_linear16_udf,
    resample_udf,
)
from streamprocess_spark.functions.image import (
    detect_layout_udf,
    validate_image_udf,
)
from streamprocess_spark.functions.inference import (
    OCR_LINE_SCHEMA,
    ocr_udf,
    transcribe_udf,
)
from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.plans.registry import register

# ---------------------------------------------------------------------------
# deterministic payload synthesis (fixture layer, FIXTURES.md §B)
# ---------------------------------------------------------------------------

FRAME = 480  # 30 ms @ 16 kHz — the VAD frame (audio_processor.py:240)


def _np_synth_audio(d: int) -> bytes:
    """PCM16 audio for doc d: nf = 10 + d%5 frames of 480 samples;
    frame f is silent (exact zeros) iff (f + d) % 3 == 0; speech
    sample i has int16 value k*32 with k = (d*31 + i*7) % 1025 - 512,
    so the decoded float is the dyadic k/1024 — exact everywhere."""
    nf = 10 + d % 5
    i = np.arange(nf * FRAME, dtype=np.int64)
    k = (d * 31 + i * 7) % 1025 - 512
    k[((i // FRAME) + d) % 3 == 0] = 0
    return (k * 32).astype("<i2").tobytes()


def _np_synth_image(d: int) -> tuple[bytes, int, int]:
    """GRAY8 raster for doc d. d%10==0 → blank white page; d%10==1 →
    60px-wide page (fails min-size validation); else a white page with
    nb = 1 + d%3 dark blocks in disjoint 20px bands:
      block k: y = 10 + 30k, h = 20,
               x = 5 + (7d + 13k) % (w - 70), w_blk = 40 + (5d + 11k) % 20.
    x + w_blk <= w - 7, so no block is ever clipped."""
    m = d % 10
    h = 120 + (d % 2) * 60
    w = 60 if m == 1 else 160 + (d % 3) * 80
    img = np.full((h, w), 255, dtype=np.uint8)
    if m >= 2:
        for k in range(1 + d % 3):
            y = 10 + k * 30
            x = 5 + (d * 7 + k * 13) % (w - 70)
            bw = 40 + (d * 5 + k * 11) % 20
            img[y : y + 20, x : x + bw] = 40
    return img.tobytes(), w, h


@pandas_udf(T.BinaryType())
def _synth_audio_udf(doc_id: pd.Series) -> pd.Series:
    return doc_id.apply(lambda d: _np_synth_audio(int(d)))


@pandas_udf(T.BinaryType())
def _synth_image_udf(doc_id: pd.Series) -> pd.Series:
    return doc_id.apply(lambda d: _np_synth_image(int(d))[0])


def _audio_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select("doc_id").withColumn(
        "samples", decode_linear16_udf(_synth_audio_udf(F.col("doc_id")))
    )


def _image_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn(
            "width",
            F.when(F.col("doc_id") % 10 == 1, F.lit(60)).otherwise(
                F.lit(160) + (F.col("doc_id") % 3).cast("int") * 80
            ).cast("int"),
        )
        .withColumn(
            "height", (F.lit(120) + (F.col("doc_id") % 2).cast("int") * 60).cast("int")
        )
        .withColumn("image", _synth_image_udf(F.col("doc_id")))
    )


# fixed-point (µ-precision) sum of an array<float> column, JVM-side
_FP_SUM = (
    "aggregate(transform({arr}, x -> cast(floor({val} * 1000000.0) as bigint)), "
    "cast(0 as bigint), (a, x) -> a + x)"
)

# shared oracle CTEs: per-doc frame/sample expansion from the formula
_AUDIO_CTE = f"""
    au AS (SELECT doc_id, 10 + doc_id % 5 AS nf FROM documents),
    samp AS (
        SELECT a.doc_id, a.nf,
               CASE WHEN ((t.i // {FRAME}) + a.doc_id) % 3 = 0 THEN 0
                    ELSE (a.doc_id * 31 + t.i * 7) % 1025 - 512 END AS k
        FROM au a, range(0, {FRAME} * 15) t(i)
        WHERE t.i < a.nf * {FRAME}
    )"""

_FRAME_CTE = """
    au AS (SELECT doc_id, 10 + doc_id % 5 AS nf FROM documents),
    fr AS (
        SELECT a.doc_id, a.nf, t.f,
               CASE WHEN (t.f + a.doc_id) % 3 = 0 THEN 0 ELSE 1 END AS sp
        FROM au a, range(0, 15) t(f)
        WHERE t.f < a.nf
    )"""

# formula-placed layout blocks (only docs with d%10 >= 2 have content)
_BLOCK_CTE = """
    blk AS (
        SELECT d.doc_id, t.k AS idx,
               5 + (d.doc_id * 7 + t.k * 13)
                   % ((160 + (d.doc_id % 3) * 80) - 70) AS x,
               10 + t.k * 30 AS y,
               40 + (d.doc_id * 5 + t.k * 11) % 20 AS bw
        FROM documents d, range(0, 3) t(k)
        WHERE d.doc_id % 10 >= 2 AND t.k < 1 + d.doc_id % 3
    )"""


# ---------------------------------------------------------------------------
# audio path (F9 decode → F7 VAD → F1 resample → F24 transcribe)
# ---------------------------------------------------------------------------

@register(
    "q50_audio_decode",
    oracle=f"""
    WITH {_AUDIO_CTE}
    SELECT doc_id,
           count(*)::BIGINT AS n_samples,
           cast(sum(cast(floor((k / 1024.0) * 1000000.0) AS BIGINT)) AS BIGINT)
               AS ssum_fp,
           cast(sum(cast(floor(abs(k / 1024.0) * 1000000.0) AS BIGINT)) AS BIGINT)
               AS sabs_fp
    FROM samp GROUP BY doc_id
    """,
    covers=("F9", "S15", "§3.2"),
    doc="LINEAR16 PCM decode (stt_worker.py:381-394) through the Arrow "
        "pandas UDF; µ-fixed-point content sums verify every decoded "
        "sample bit-for-bit against the synthesis formula.",
    bench=True,
)
def q50_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # decode + µ-fixed-point sums fused in one Arrow pass: the earlier
    # samples-array + aggregate() HOF form shipped 33M floats to the
    # JVM and summed through interpreted lambdas (~6 s of q50's honest
    # 7.4 s at sf0.1, measured after the round-8 timing-action fix);
    # the fused scorer emits bit-identical int64s (see
    # linear16_fp_stats_udf). Queries that CONSUME the sample array
    # (q51/q52/q56...) keep the array path.
    from streamprocess_spark.functions.audio import linear16_fp_stats_udf

    docs = load_tables(spark, sf_dir)["documents"]
    st = linear16_fp_stats_udf(_synth_audio_udf(F.col("doc_id")))
    return docs.select("doc_id", st.alias("_st")).select(
        "doc_id",
        F.col("_st.n_samples").alias("n_samples"),
        F.col("_st.ssum_fp").alias("ssum_fp"),
        F.col("_st.sabs_fp").alias("sabs_fp"),
    )


@register(
    "q51_audio_vad",
    oracle=f"""
    WITH {_FRAME_CTE}
    SELECT doc_id,
           count(*)::BIGINT AS n_frames,
           cast(sum(sp) AS BIGINT) AS n_speech
    FROM fr GROUP BY doc_id
    """,
    covers=("F7", "T4"),
    doc="Frame-energy VAD flags (audio_processor.py:217-278) over "
        "decoded audio; speech-frame counts match the silence pattern "
        "the synthesis formula placed (29× RMS margin → no ulp flips).",
)
def q51_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.audio import vad_udf

    flags = vad_udf(sr=16000, frame_ms=30, threshold=0.01)
    return (
        _audio_df(spark, sf_dir)
        .withColumn("flags", flags(F.col("samples")))
        .select(
            "doc_id",
            F.size("flags").cast("bigint").alias("n_frames"),
            F.expr("size(filter(flags, x -> x))").cast("bigint").alias("n_speech"),
        )
    )


@register(
    "q52_audio_resample",
    oracle=f"""
    WITH {_AUDIO_CTE}
    SELECT doc_id,
           cast(count(*) * 2 AS BIGINT) AS n_out,
           cast(sum(cast(floor((k / 1024.0) * 1000000.0) AS BIGINT)) AS BIGINT)
               AS ssum_even_fp
    FROM samp GROUP BY doc_id
    """,
    covers=("F1",),
    doc="2× linear-interp resample (audio_processor.py:70-82): output "
        "grid points at even indices coincide exactly with input knots "
        "(same correctly-rounded double time values), so the even-index "
        "fixed-point sum equals the input sum and the length doubles.",
)
def q52_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    up = resample_udf(8000, 16000)
    even_sum = (
        "aggregate(transform(resampled, (x, i) -> IF(i % 2 = 0, "
        "cast(floor(cast(x as double) * 1000000.0) as bigint), "
        "cast(0 as bigint))), cast(0 as bigint), (a, x) -> a + x)"
    )
    return (
        _audio_df(spark, sf_dir)
        .withColumn("resampled", up(F.col("samples")))
        .select(
            "doc_id",
            F.size("resampled").cast("bigint").alias("n_out"),
            F.expr(even_sum).alias("ssum_even_fp"),
        )
    )


@register(
    "q56_transcribe_segments",
    oracle=f"""
    WITH {_FRAME_CTE}
    SELECT doc_id,
           greatest(cast(sum(CASE WHEN sp = 1 AND (f = 0 OR (f - 1 + doc_id) % 3 = 0)
                                  THEN 1 ELSE 0 END) AS BIGINT), 1) AS n_segments,
           'en' AS language
    FROM fr GROUP BY doc_id
    """,
    covers=("F24", "F27", "§2.12-udtf"),
    doc="Mock-Whisper transcription (deterministic stand-in for "
        "stt_worker.py:201-212, per the reference's own mock strategy "
        "tests/conftest.py:168-185): segment count = VAD speech-island "
        "count, reproduced by the oracle from the frame pattern.",
)
def q56_transcribe_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = transcribe_udf(sr=16000)
    return (
        _audio_df(spark, sf_dir)
        .withColumn("t", tr(F.col("samples")))
        .select(
            "doc_id",
            F.col("t.n_segments").cast("bigint").alias("n_segments"),
            F.col("t.language").alias("language"),
        )
    )


# ---------------------------------------------------------------------------
# image path (decode → F22 validate → F18 layout → F25 OCR)
# ---------------------------------------------------------------------------

@register(
    "q54_image_validate",
    oracle="""
    SELECT CASE WHEN doc_id % 10 = 1 THEN 'too_small'
                WHEN doc_id % 10 = 0 THEN 'blank'
                ELSE 'ok' END AS reason,
           count(*)::BIGINT AS n_docs
    FROM documents GROUP BY 1
    """,
    covers=("F22", "R5"),
    doc="Image validation gate (image_processor.py:422-446): size "
        "bounds + <1% non-white blank check, grouped rejection reasons.",
)
def q54_image_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _image_df(spark, sf_dir)
        .withColumn(
            "v", validate_image_udf(F.col("image"), F.col("width"), F.col("height"))
        )
        .groupBy(F.col("v.reason").alias("reason"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q53_image_layout",
    oracle=f"""
    WITH {_BLOCK_CTE}
    SELECT doc_id,
           cast(idx AS BIGINT) AS idx,
           'block' AS etype,
           cast(x AS BIGINT) AS x,
           cast(y AS BIGINT) AS y,
           cast(bw AS BIGINT) AS width,
           cast(20 AS BIGINT) AS height
    FROM blk
    """,
    covers=("F18", "W4", "§2.12-udtf"),
    doc="Projection-profile layout detection (image_processor.py:288-"
        "335) + top-to-bottom/left-to-right positional sort (:329), "
        "exploded one row per detected element; the oracle recomputes "
        "the exact block geometry the synthesis formula placed.",
)
def q53_image_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _image_df(spark, sf_dir)
        .filter(F.col("doc_id") % 10 >= 2)
        .withColumn(
            "elems", detect_layout_udf(F.col("image"), F.col("width"), F.col("height"))
        )
        .select("doc_id", F.posexplode("elems").alias("idx", "e"))
        .select(
            "doc_id",
            F.col("idx").cast("bigint").alias("idx"),
            F.col("e.type").alias("etype"),
            F.col("e.x").cast("bigint").alias("x"),
            F.col("e.y").cast("bigint").alias("y"),
            F.col("e.width").cast("bigint").alias("width"),
            F.col("e.height").cast("bigint").alias("height"),
        )
    )


# the mock OCR word list (functions.inference._WORDS) as a SQL literal
_WORDS_SQL = (
    "['hello','world','stream','process','audio','text','spark','data',"
    "'batch','window','session','partial','final','decode','merge']"
)


def _sql_word(j: int) -> str:
    """DuckDB expr for mock-OCR word j: _WORDS[(md5_byte_j + idx) % 15]."""
    byte = f"('0x' || substr(hh, {2 * j + 1}, 2))::INT"
    return f"{_WORDS_SQL}[(({byte} + idx) % 15) + 1]"


@register(
    "q55_ocr_lines",
    oracle=f"""
    WITH {_BLOCK_CTE},
    sig AS (
        SELECT doc_id, idx,
               md5(cast(x AS VARCHAR) || ',' || cast(y AS VARCHAR) || ',' ||
                   cast(bw AS VARCHAR) || ',20') AS hh
        FROM blk
    )
    SELECT doc_id,
           cast(idx AS BIGINT) AS idx,
           {_sql_word(0)} || ' ' || {_sql_word(1)} || ' ' ||
           {_sql_word(2)} || ' ' || {_sql_word(3)} AS text,
           cast(50 + ('0x' || substr(hh, 1, 2))::INT % 50 AS BIGINT) AS conf_pct
    FROM sig
    """,
    covers=("F25", "A2", "§2.12-udtf", "§3.3"),
    doc="Mock-PaddleOCR lines (deterministic stand-in per "
        "tests/conftest.py:188-200): one line per layout block, text "
        "and confidence derived from md5 of the block geometry — "
        "DuckDB's md5 reproduces both bit-for-bit.",
    bench=True,
)
def q55_ocr_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_tables(spark, sf_dir)["documents"].select("doc_id")
        .filter(F.col("doc_id") % 10 >= 2)
        .withColumn("lines", _synth_ocr_udf(F.col("doc_id")))
        .select("doc_id", F.posexplode("lines").alias("idx", "l"))
        .select(
            "doc_id",
            F.col("idx").cast("bigint").alias("idx"),
            F.col("l.text").alias("text"),
            F.round(F.col("l.confidence") * 100, 0).cast("bigint").alias("conf_pct"),
        )
    )


@pandas_udf(OCR_LINE_SCHEMA)
def _synth_ocr_udf(doc_id: pd.Series) -> pd.Series:
    """Fused fixture-synthesis + OCR for q55 (the q50 fusion pattern).

    The unfused form shipped every synthesized raster Python -> JVM
    (Arrow) -> Python just to call mock_paddleocr on it — two Arrow
    crossings of ~58 KB/image that exist only because the FIXTURE is
    synthesized in Python. A real deployment reads the binary column
    from storage and decodes+OCRs in ONE Python stage, so the fused
    plan (single ArrowEvalPython over doc_id) is the representative
    shape, not a shortcut. Outputs are bit-identical: mock_paddleocr
    runs on the same ndarray _np_synth_image produced (the
    bytes->decode_image round-trip it skips is a reshape). The
    general binary-column OCR path (ocr_udf over an `image` column)
    stays the engine surface for q56/q_image_suite/q_inference_suite."""
    import numpy as np

    from streamprocess_spark.functions.inference import mock_paddleocr

    out = []
    for d in doc_id:
        raw, w, h = _np_synth_image(int(d))
        out.append(
            mock_paddleocr(np.frombuffer(raw, dtype=np.uint8).reshape(h, w))
        )
    return pd.Series(out)


# ---------------------------------------------------------------------------
# remaining audio scalar functions (F2 mono, F3 normalize, F10 chain)
# ---------------------------------------------------------------------------

@pandas_udf(T.BinaryType())
def _synth_stereo_udf(doc_id: pd.Series) -> pd.Series:
    """Interleaved 2-channel PCM16: sample j has k = (d*31+j*7)%1025-512."""
    def synth(d: int) -> bytes:
        n2 = 2 * (10 + d % 5) * FRAME
        j = np.arange(n2, dtype=np.int64)
        k = (d * 31 + j * 7) % 1025 - 512
        return (k * 32).astype("<i2").tobytes()

    return doc_id.apply(lambda d: synth(int(d)))


@pandas_udf(T.BinaryType())
def _synth_const_amp_udf(doc_id: pd.Series) -> pd.Series:
    """Constant-magnitude PCM16: |x| = 2^-(1 + d%3) exactly (so RMS is
    an exact power of two and the 0 dBFS normalize gain is exact);
    sign of sample i from (d*3 + i*5) % 7 < 4."""
    def synth(d: int) -> bytes:
        i = np.arange(4800, dtype=np.int64)
        sgn = np.where((d * 3 + i * 5) % 7 < 4, 1, -1)
        return (sgn * (16384 >> (d % 3))).astype("<i2").tobytes()

    return doc_id.apply(lambda d: synth(int(d)))


@register(
    "q57_audio_mono",
    oracle=f"""
    WITH au AS (SELECT doc_id, (10 + doc_id % 5) * {FRAME} AS n FROM documents),
    pair AS (
        SELECT a.doc_id,
               (a.doc_id * 31 + (2 * t.i) * 7) % 1025 - 512 AS k1,
               (a.doc_id * 31 + (2 * t.i + 1) * 7) % 1025 - 512 AS k2
        FROM au a, range(0, {FRAME} * 15) t(i)
        WHERE t.i < a.n
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_mono,
           cast(sum(cast(floor(((k1 + k2) / 2048.0) * 1000000.0) AS BIGINT))
                AS BIGINT) AS msum_fp
    FROM pair GROUP BY doc_id
    """,
    covers=("F2",),
    doc="Stereo→mono channel mean (audio_processor.py:84-91): each "
        "mono sample (k1+k2)/2048 is dyadic, so the fixed-point sum is "
        "exact in float32, Spark, and DuckDB alike.",
)
def q57_audio_mono(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.audio import to_mono_udf

    docs = load_tables(spark, sf_dir)["documents"]
    mono = to_mono_udf(channels=2)
    msum = _FP_SUM.format(arr="mono", val="cast(x as double)")
    return (
        docs.select("doc_id")
        .withColumn("stereo", decode_linear16_udf(_synth_stereo_udf(F.col("doc_id"))))
        .withColumn("mono", mono(F.col("stereo")))
        .select(
            "doc_id",
            F.size("mono").cast("bigint").alias("n_mono"),
            F.expr(msum).alias("msum_fp"),
        )
    )


@register(
    "q58_audio_normalize",
    oracle="""
    WITH s AS (
        SELECT d.doc_id,
               CASE WHEN (d.doc_id * 3 + t.i * 5) % 7 < 4 THEN 1 ELSE -1 END AS sgn
        FROM documents d, range(0, 4800) t(i)
    )
    SELECT doc_id,
           cast(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           cast(sum(sgn) * 1000000 AS BIGINT) AS ssum_fp
    FROM s GROUP BY doc_id
    """,
    covers=("F3",),
    doc="RMS→dBFS normalization (audio_processor.py:93-114) at 0 dBFS "
        "over constant-magnitude input: RMS is an exact power of two, "
        "the gain is its exact reciprocal, and every output is exactly "
        "±1.0 — any gain-math error would break the match.",
)
def q58_audio_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.audio import normalize_udf

    docs = load_tables(spark, sf_dir)["documents"]
    norm0 = normalize_udf(target_dbfs=0.0)
    ssum = _FP_SUM.format(arr="normed", val="cast(x as double)")
    return (
        docs.select("doc_id")
        .withColumn(
            "normed",
            norm0(decode_linear16_udf(_synth_const_amp_udf(F.col("doc_id")))),
        )
        .select(
            "doc_id",
            F.expr("size(filter(normed, x -> x > 0))").cast("bigint").alias("n_pos"),
            F.expr(ssum).alias("ssum_fp"),
        )
    )


@register(
    "q59_audio_preprocess",
    oracle=None,  # IIR filtfilt + AGC scan + FFT features: not SQL-expressible
    covers=("F4", "F5", "F6", "F8", "F10"),
    doc="Full preprocess composition (audio_processor.py:20-68): "
        "resample→mono→normalize→HPF→AGC, then spectral feature "
        "extraction (:384-420). Recursive filters and FFTs have no SQL "
        "equivalent, so the driver records the rows-only check; "
        "determinism across runs is still exact (pure numpy on "
        "deterministic input).",
)
def q59_audio_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.audio import features_udf, preprocess_udf

    pre = preprocess_udf(orig_sr=16000, target_sr=16000, denoise=True)
    feats = features_udf(sr=16000)
    return (
        _audio_df(spark, sf_dir)
        .withColumn("clean", pre(F.col("samples")))
        .withColumn("f", feats(F.col("clean")))
        .select(
            "doc_id",
            F.size("clean").cast("bigint").alias("n_out"),
            F.round("f.rms", 6).alias("rms"),
            F.round("f.centroid", 3).alias("centroid"),
            F.round("f.rolloff", 3).alias("rolloff"),
        )
    )


# ---------------------------------------------------------------------------
# remaining image functions (F13 denoise, F15 binarize, F19 tables, F20 crop)
# ---------------------------------------------------------------------------

@register(
    "q60_image_binarize",
    oracle=f"""
    WITH {_BLOCK_CTE}
    SELECT d.doc_id,
           cast(coalesce(sum(b.bw * 20), 0) AS BIGINT) AS n_dark
    FROM documents d LEFT JOIN blk b USING (doc_id)
    GROUP BY d.doc_id
    """,
    covers=("F15",),
    doc="Otsu binarization (image_processor.py:217-236): dark-pixel "
        "count equals the exact block area the synthesis placed "
        "(blank/small pages → 0).",
)
def q60_image_binarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.image import binarize_udf, dark_count_udf

    return (
        _image_df(spark, sf_dir)
        .withColumn(
            "bin", binarize_udf(F.col("image"), F.col("width"), F.col("height"))
        )
        .select("doc_id", dark_count_udf(F.col("bin")).alias("n_dark"))
    )


@register(
    "q61_image_tables",
    oracle=f"""
    WITH {_BLOCK_CTE}
    SELECT doc_id,
           cast(row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1
                AS BIGINT) AS tidx,
           cast(x AS BIGINT) AS x,
           cast(y AS BIGINT) AS y,
           cast(bw AS BIGINT) AS width,
           cast(20 AS BIGINT) AS height
    FROM blk WHERE bw * 20 > 1000
    """,
    covers=("F19",),
    doc="Table-region detection (image_processor.py:337-369, the "
        "area>1000 filter at :361; morphological line mask needs cv2 — "
        "deviation documented in functions.image).",
)
def q61_image_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.image import detect_tables_udf

    return (
        _image_df(spark, sf_dir)
        .filter(F.col("doc_id") % 10 >= 2)
        .withColumn(
            "tables", detect_tables_udf(F.col("image"), F.col("width"), F.col("height"))
        )
        .select("doc_id", F.posexplode("tables").alias("tidx", "t"))
        .select(
            "doc_id",
            F.col("tidx").cast("bigint").alias("tidx"),
            F.col("t.x").cast("bigint").alias("x"),
            F.col("t.y").cast("bigint").alias("y"),
            F.col("t.width").cast("bigint").alias("width"),
            F.col("t.height").cast("bigint").alias("height"),
        )
    )


@register(
    "q62_image_crop",
    oracle=f"""
    WITH {_BLOCK_CTE}
    SELECT doc_id,
           cast(least(160 + (doc_id % 3) * 80, max(x + bw - 1) + 11)
                - greatest(min(x) - 10, 0) AS BIGINT) AS crop_w,
           cast(least(120 + (doc_id % 2) * 60, max(y) + 19 + 11)
                - greatest(min(y) - 10, 0) AS BIGINT) AS crop_h
    FROM blk GROUP BY doc_id
    """,
    covers=("F20",),
    doc="Crop-to-content (image_processor.py:371-398): non-white bbox "
        "+ 10px padding; the oracle recomputes the bbox from the block "
        "formula with the same clamping.",
)
def q62_image_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.image import crop_dims_udf

    return (
        _image_df(spark, sf_dir)
        .filter(F.col("doc_id") % 10 >= 2)
        .withColumn(
            "c", crop_dims_udf(F.col("image"), F.col("width"), F.col("height"))
        )
        .select(
            "doc_id",
            F.col("c.crop_w").cast("bigint").alias("crop_w"),
            F.col("c.crop_h").cast("bigint").alias("crop_h"),
        )
    )


@register(
    "q63_image_denoise_chain",
    oracle=f"""
    WITH {_BLOCK_CTE}
    SELECT d.doc_id,
           cast(coalesce(sum(b.bw * 20 - 4), 0) AS BIGINT) AS n_dark
    FROM documents d LEFT JOIN blk b USING (doc_id)
    GROUP BY d.doc_id
    """,
    covers=("F13", "F15", "F16-shape"),
    doc="Chained binary→binary UDF stages (the §3.3 preprocess shape): "
        "3x3 median denoise (image_processor.py:182-196) then Otsu "
        "binarize then dark count. The median erases exactly the 4 "
        "corner pixels of every rectangular block (4 dark vs 5 white "
        "in the corner window), so n_dark = area - 4 per block.",
)
def q63_image_denoise_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.image import (
        binarize_udf,
        dark_count_udf,
        median_denoise_udf,
    )

    return (
        _image_df(spark, sf_dir)
        .withColumn(
            "den", median_denoise_udf(F.col("image"), F.col("width"), F.col("height"))
        )
        .withColumn(
            "bin", binarize_udf(F.col("den"), F.col("width"), F.col("height"))
        )
        .select("doc_id", dark_count_udf(F.col("bin")).alias("n_dark"))
    )


@register(
    "q66_image_resize",
    oracle=f"""
    WITH {_BLOCK_CTE}
    SELECT d.doc_id,
           cast(coalesce(sum(b.bw * 20), 0) * 4 AS BIGINT) AS n_dark_2x
    FROM documents d LEFT JOIN blk b USING (doc_id)
    GROUP BY d.doc_id
    """,
    covers=("F17",),
    doc="DPI adjustment via nearest-neighbor rescale "
        "(image_processor.py:264-286): a 2x integer upscale duplicates "
        "every pixel exactly 4x, so the binarized dark count scales by "
        "4 — verified against the block-area formula.",
)
def q66_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.image import resize_binarize_count_udf

    cnt = resize_binarize_count_udf(2.0)
    return _image_df(spark, sf_dir).select(
        "doc_id",
        cnt(F.col("image"), F.col("width"), F.col("height")).alias("n_dark_2x"),
    )


@register(
    "q67_image_enhance",
    oracle="""
    SELECT doc_id,
           cast(0 AS BIGINT) AS out_min,
           cast(255 AS BIGINT) AS out_max,
           cast((160 + (doc_id % 3) * 80) * (120 + (doc_id % 2) * 60)
                AS BIGINT) AS n_px
    FROM documents WHERE doc_id % 10 >= 2
    """,
    covers=("F14", "F21"),
    doc="CLAHE-style contrast enhancement + gamma LUT "
        "(image_processor.py:198-215, enhance_for_ocr :400-420). The "
        "oracle IS closed-form: the synthetic pages' dark fraction is "
        "analytically in [2.8%, 9.2%] (1-3 blocks of 800-1180 px on a "
        "19.2k-38.4k px page), so p2=40 and p98=255 always, the "
        "stretch maps 40->0 / 255->255, and the gamma LUT fixes both "
        "endpoints — out_min/out_max are exactly 0/255 for every "
        "content page, and n_px is the formula page area.",
)
def q67_image_enhance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.image import enhance_stats_udf

    return (
        _image_df(spark, sf_dir)
        .filter(F.col("doc_id") % 10 >= 2)
        .withColumn(
            "s", enhance_stats_udf(F.col("image"), F.col("width"), F.col("height"))
        )
        .select(
            "doc_id",
            F.col("s.out_min").cast("bigint").alias("out_min"),
            F.col("s.out_max").cast("bigint").alias("out_max"),
            F.col("s.n_px").alias("n_px"),
        )
    )


@register(
    "q78_segment_udtf",
    oracle=f"""
    WITH {_FRAME_CTE},
    runs AS (
        SELECT doc_id, f,
               CASE WHEN sp = 1 AND (f = 0 OR (f - 1 + doc_id) % 3 = 0)
                    THEN 1 ELSE 0 END AS is_start
        FROM fr WHERE sp = 1
    ), seg AS (
        SELECT doc_id, f,
               sum(is_start) OVER (PARTITION BY doc_id ORDER BY f) - 1
                   AS seg_idx
        FROM runs
    )
    SELECT doc_id,
           cast(seg_idx AS INT) AS seg_idx,
           cast(min(f) AS INT) AS start_frame,
           cast(count(*) AS INT) AS n_frames
    FROM seg GROUP BY doc_id, seg_idx
    """,
    covers=("§2.12-udtf", "T5", "W2"),
    doc="Native Python UDTF (the Spark 3.5+ @udtf table function, the "
        "alternative §2.12 mapping next to pandas-UDF+explode): one "
        "output row per VAD speech island — the whisper-segments-per-"
        "job shape (stt_worker.py:216-225). Oracle = gaps-and-islands "
        "over the synthesis frame pattern.",
)
def q78_segment_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="seg_idx int, start_frame int, n_frames int")
    class SpeechIslands:
        def eval(self, samples):  # noqa: D102
            import numpy as np

            from streamprocess_spark.functions.audio import np_vad_flags

            flags = np_vad_flags(
                np.asarray(samples, dtype=np.float32), sr=16000,
                frame_ms=30, threshold=0.01,
            )
            idx = -1
            prev = False
            start = 0
            n = 0
            for f, speech in enumerate(flags):
                if speech and not prev:
                    if n:
                        yield (idx, start, n)
                    idx += 1
                    start, n = f, 0
                if speech:
                    n += 1
                prev = bool(speech)
            if n:
                yield (idx, start, n)

    spark.udtf.register("speech_islands", SpeechIslands)
    _audio_df(spark, sf_dir).createOrReplaceTempView("audio_tmp_q78")
    return spark.sql(
        "SELECT a.doc_id, t.seg_idx, t.start_frame, t.n_frames "
        "FROM audio_tmp_q78 a, LATERAL speech_islands(a.samples) t"
    )


# ---------------------------------------------------------------------------
# native-expression scalar ops (F23 bbox-from-quad, §2.10 built-ins)
# ---------------------------------------------------------------------------

@register(
    "q64_bbox_quad",
    oracle="""
    WITH q AS (
        SELECT event_id,
               event_id % 500 + 10 AS a, (event_id * 3) % 400 + 10 AS b,
               20 + event_id % 80 AS w1, 15 + event_id % 60 AS h1,
               1 + event_id % 5 AS e, 1 + event_id % 7 AS e2
        FROM events
    )
    SELECT event_id,
           least(a + e, a + w1, a + w1 - e, a) AS bbox_x,
           least(b, b + e2, b + h1, b + h1 - e2) AS bbox_y,
           greatest(a + e, a + w1, a + w1 - e, a)
               - least(a + e, a + w1, a + w1 - e, a) AS bbox_w,
           greatest(b, b + e2, b + h1, b + h1 - e2)
               - least(b, b + e2, b + h1, b + h1 - e2) AS bbox_h
    FROM q
    """,
    covers=("F23",),
    doc="Bounding box from rotated-quad corner points "
        "(ocr_worker.py:373-379): array_min/array_max over the corner "
        "arrays — pure native expressions, no UDF.",
)
def q64_bbox_quad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"].select("event_id")
    a = F.col("event_id") % 500 + 10
    b = (F.col("event_id") * 3) % 400 + 10
    w1 = F.col("event_id") % 80 + 20
    h1 = F.col("event_id") % 60 + 15
    e = F.col("event_id") % 5 + 1
    e2 = F.col("event_id") % 7 + 1
    xs = F.array(a + e, a + w1, a + w1 - e, a)
    ys = F.array(b, b + e2, b + h1, b + h1 - e2)
    return ev.select(
        "event_id",
        F.array_min(xs).alias("bbox_x"),
        F.array_min(ys).alias("bbox_y"),
        (F.array_max(xs) - F.array_min(xs)).alias("bbox_w"),
        (F.array_max(ys) - F.array_min(ys)).alias("bbox_h"),
    )


@register(
    "q65_scalar_builtins",
    oracle=r"""
    SELECT doc_id,
           concat_ws('-', lang, source) AS tag,
           substr(trim(text), 1, 50) AS head50,
           cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wc,
           cast(ceil(n_chars / 100.0) AS BIGINT) AS ceil100,
           cast(pow(2.0, doc_id % 10) AS BIGINT) AS p2,
           md5(text) AS text_md5,
           base64(encode(lang)) AS lang_b64
    FROM documents
    """,
    covers=("§2.10-builtins", "O5"),
    doc="String/math built-ins the reference uses imperatively "
        "(SURVEY §2.10 tail): concat_ws/trim/substr (stt_worker.py:347, "
        "ocr/service.py:258), split, ceil (controller.py:326), pow "
        "(redis_consumer.go:262 backoff), md5 fingerprints, base64 "
        "(ocr_worker.py:289-291) — all Catalyst expressions.",
)
def q65_scalar_builtins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        F.concat_ws("-", "lang", "source").alias("tag"),
        F.substring(F.trim(F.col("text")), 1, 50).alias("head50"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("wc"),
        F.ceil(F.col("n_chars") / F.lit(100.0)).cast("bigint").alias("ceil100"),
        F.pow(F.lit(2.0), (F.col("doc_id") % 10).cast("double"))
            .cast("bigint").alias("p2"),
        F.md5(F.col("text")).alias("text_md5"),
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
    )


@register(
    "q91_image_deskew",
    oracle=None,  # PCA/trig float geometry: not SQL-expressible
    covers=("F11", "F12"),
    doc="F11/F12 made real without cv2: per-doc synthetic page rotated "
        "by a formula angle (doc_id % 9 - 4 degrees), corrected by the "
        "pure-NumPy PCA deskew (minAreaRect analog, "
        "image_processor.py:143-180; angle-search rotation "
        "image_processor.py:81-141). Emits the injected angle, the "
        "estimator's observed delta, and the projection-profile "
        "sharpness gain of the correction. Rows-only check here; the "
        "estimator's accuracy itself is unit-tested "
        "(tests/test_functions.py).",
)
def q91_image_deskew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.image import deskew_report_udf

    return (
        _image_df(spark, sf_dir)
        .filter(F.col("doc_id") % 10 >= 2)
        .withColumn(
            "inject", ((F.col("doc_id") % 9) - F.lit(4)).cast("double")
        )
        .withColumn(
            "r",
            deskew_report_udf(
                F.col("image"), F.col("width"), F.col("height"), F.col("inject")
            ),
        )
        .select(
            "doc_id",
            F.col("r.inject_deg").alias("inject_deg"),
            F.col("r.delta_deg").alias("delta_deg"),
            F.col("r.sharp_gain").alias("sharp_gain"),
        )
    )


def _np_synth_lines(d: int) -> np.ndarray:
    """Text-line page for doc d: 3px-tall dark rows every 14 px with
    10px margins, same page dims as _np_synth_image. Unlike the solid
    blocks (whose projection-profile variance is multi-modal under
    rotation), thin periodic lines make the profile-sharpness criterion
    peak EXACTLY at axis alignment, so the 0.5-degree grid search
    recovers the injected angle bit-for-bit (verified over 600 docs:
    0 mismatches, sharpness gain >= 1.5 for every nonzero skew)."""
    h = 120 + (d % 2) * 60
    w = 160 + (d % 3) * 80
    img = np.full((h, w), 255, dtype=np.uint8)
    for y in range(14, h - 14, 14):
        img[y:y + 3, 10:w - 10] = 30
    return img


DESKEW_GRID_SCHEMA = T.StructType([
    T.StructField("applied_deg", T.DoubleType()),
    T.StructField("sharp_gain", T.DoubleType()),
    T.StructField("pca_err", T.DoubleType()),
])


@pandas_udf(DESKEW_GRID_SCHEMA)
def _deskew_grid_udf(doc_id: pd.Series, inject: pd.Series) -> pd.DataFrame:
    """F11 grid-search deskew + F12 PCA estimate under known injected
    skew on the text-line page. applied_deg is the sharpness-argmax
    correction (exactly -inject on the 0.5-degree grid); sharp_gain is
    corrected/skewed profile variance (>= 1 structurally: the argmax
    candidate set includes the identity rotation); pca_err is the PCA
    estimator's absolute error vs the injection (measured < 0.8 deg on
    this fixture — bounded, not exact)."""
    from streamprocess_spark.functions.image import (
        auto_rotate,
        deskew,
        np_profile_sharpness,
        np_rotate,
        np_text_angle_pca,
    )

    rows = []
    for d, a in zip(doc_id, inject):
        base = _np_synth_lines(int(d))
        est_base = np_text_angle_pca(base)
        skewed = np_rotate(base, float(a))
        corrected, applied = auto_rotate(skewed)
        _, est_rot = deskew(skewed)
        s0 = np_profile_sharpness(skewed)
        s1 = np_profile_sharpness(corrected)
        rows.append({
            "applied_deg": float(applied),
            "sharp_gain": (s1 / s0) if s0 > 0 else 1.0,
            "pca_err": abs((est_rot - est_base) - float(a)),
        })
    return pd.DataFrame(rows)


@register(
    "q128_deskew_grid",
    oracle="""
    SELECT doc_id,
           cast(-2 * (doc_id % 9 - 4) AS BIGINT) AS applied_half_deg,
           true AS gain_ok,
           true AS pca_bounded
    FROM documents WHERE doc_id % 10 >= 2
    """,
    covers=("F11", "F12"),
    doc="F11/F12 with an EXACT oracle: the text-line page is rotated "
        "by the formula angle (doc_id%9-4 deg) and the 0.5-deg grid "
        "search (image_processor.py:81-141) must recover exactly the "
        "negated injection — closed-form in SQL as half-degree ints. "
        "gain_ok asserts the structural sharpness bound (argmax "
        "includes identity, and >1.2 when a real skew was corrected); "
        "pca_bounded bounds the PCA estimator's error "
        "(image_processor.py:143-180) under 1.5 deg.",
)
def q128_deskew_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") % 10 >= 2)
        .withColumn("inject", ((F.col("doc_id") % 9) - F.lit(4)).cast("double"))
        .withColumn("r", _deskew_grid_udf(F.col("doc_id"), F.col("inject")))
        .select(
            "doc_id",
            (F.col("r.applied_deg") * 2).cast("bigint").alias("applied_half_deg"),
            (
                (F.col("r.sharp_gain") >= 1.0 - F.lit(1e-9))
                & ((F.col("inject") == 0) | (F.col("r.sharp_gain") > 1.2))
            ).alias("gain_ok"),
            (F.col("r.pca_err") < 1.5).alias("pca_bounded"),
        )
    )


# ---------------------------------------------------------------------------
# PNG container ingest (S15) — real codec, exact-pixel oracle
# ---------------------------------------------------------------------------

PNG_STATS_SCHEMA = T.StructType([
    T.StructField("png_w", T.IntegerType()),
    T.StructField("png_h", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
])


@pandas_udf(T.BinaryType())
def _synth_png_udf(doc_id: pd.Series) -> pd.Series:
    """PNG-encode the formula page (np_encode_png) — the S15 container
    layer over the same deterministic raster _synth_image_udf emits.
    Docs cycle the container variants (d % 5): sequential 8-bit, Adam7
    8-bit, sequential 16-bit (samples ×257 so the 8-bit collapse is
    exact), Adam7 16-bit, and paletted (color type 3 with an identity
    gray palette, so PLTE lookup reproduces the raster) — every
    decoder path is driver-exercised while the pixel-sum oracle stays
    encoding-invariant."""
    from streamprocess_spark.functions.image import (
        np_encode_png, np_encode_png_indexed,
    )

    _gray_pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)

    def enc(d: int) -> bytes:
        raw, w, h = _np_synth_image(int(d))
        img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
        v = d % 5
        if v == 4:
            return np_encode_png_indexed(img, _gray_pal)
        if v >= 2:
            img = img.astype(np.uint16) * 257
        return np_encode_png(img, interlace=bool(v % 2))

    return doc_id.apply(enc)


@pandas_udf(PNG_STATS_SCHEMA)
def _png_stats_udf(png: pd.Series) -> pd.DataFrame:
    """Real PNG decode (zlib inflate + scanline unfilter): dims parsed
    from the container's own IHDR, exact pixel sum over the raster."""
    from streamprocess_spark.functions.image import (
        np_decode_png, np_png_to_gray,
    )

    rows = []
    for raw in png:
        img = np_decode_png(raw)
        gray = np_png_to_gray(img)           # 16-bit → exact /257 collapse
        rows.append({
            "png_w": int(gray.shape[1]),
            "png_h": int(gray.shape[0]),
            "px_sum": int(gray.astype(np.int64).sum()),
        })
    return pd.DataFrame(rows)


@register(
    "q92_png_ingest",
    oracle=f"""
    WITH {_BLOCK_CTE},
    dims AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 1 THEN 60
                    ELSE 160 + (doc_id % 3) * 80 END AS w,
               120 + (doc_id % 2) * 60 AS h
        FROM documents
    )
    SELECT m.doc_id,
           cast(m.w AS INT) AS png_w,
           cast(m.h AS INT) AS png_h,
           cast(m.w * m.h * 255
                - coalesce(sum(b.bw * 20), 0) * 215 AS BIGINT) AS px_sum
    FROM dims m LEFT JOIN blk b USING (doc_id)
    GROUP BY m.doc_id, m.w, m.h
    """,
    covers=("S15",),
    doc="PNG container ingest (S15): pages are encoded as real PNGs "
        "(np_encode_png) and decoded by the dependency-free zlib+NumPy "
        "PNG reader (np_decode_png — IHDR parse, inflate, all 5 "
        "scanline filters, 8/16-bit depths, Adam7 interlace, paletted "
        "color type 3; fixtures cycle all five variants per doc_id%5); "
        "dims "
        "come from the parsed header and the exact pixel sum proves "
        "bit-identical decode against the synthesis formula (the "
        "reference decodes PNG via cv2.imdecode, ocr_worker.py:"
        "283-308). Scale: map-only per-row transform, zero shuffles.",
)
def q92_png_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("png", _synth_png_udf(F.col("doc_id")))
        .withColumn("s", _png_stats_udf(F.col("png")))
        .select(
            "doc_id",
            F.col("s.png_w").alias("png_w"),
            F.col("s.png_h").alias("png_h"),
            F.col("s.px_sum").alias("px_sum"),
        )
    )


# ---------------------------------------------------------------------------
# q136: GIF container ingest (S15) — real LZW codec, exact-pixel oracle
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_gif_udf(doc_id: pd.Series) -> pd.Series:
    """The q92 formula page as a real GIF: identity gray palette (so
    palette lookup reproduces the raster and luma == index), interlace
    by d%2, every 5th doc carries a SECOND frame (the inverted page)
    to exercise multi-frame walks, and every doc with d%7==3 appends a
    PARTIAL frame — an 8x8 sub-rectangle at (0,0) whose odd rows are
    the transparent index 255 — exercising the GIF89a compositing/
    disposal model (offsets + GCE transparency) in the oracle-hashed
    path. The page's top 10 rows are always background (blocks start
    at y=10), so the composited sums stay closed-form:
      frame3_sum = prev_total - 32*prev_bg + 32*77
    with prev_bg = 255 on the page, 0 on the inverted page."""
    from streamprocess_spark.functions.gif import (
        _lzw_gif_encode, np_encode_gif,
    )
    import struct as _struct

    _gray = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)

    def _frame_block(idx: np.ndarray, ix: int, iy: int,
                     gce: bytes = b"") -> bytes:
        ih, iw = idx.shape
        body = gce
        body += b"," + _struct.pack("<HHHH", ix, iy, iw, ih) + b"\x00\x08"
        lzw = _lzw_gif_encode(idx.tobytes(), 8)
        for i in range(0, len(lzw), 255):
            blk = lzw[i:i + 255]
            body += bytes([len(blk)]) + blk
        return body + b"\x00"

    def enc(d: int) -> bytes:
        raw, w, h = _np_synth_image(int(d))
        idx = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
        gif = np_encode_gif(idx, _gray, interlace=bool(d % 2))
        tail = b""
        if d % 5 == 0:                          # inverted full frame
            tail += _frame_block((255 - idx).astype(np.uint8), 0, 0)
        if d % 7 == 3:                          # composited sub-rect
            patch = np.full((8, 8), 77, np.uint8)
            patch[1::2, :] = 255                # transparent rows
            # GCE: disposal 0, transparency flag, t_index 255
            gce = b"\x21\xf9\x04\x01\x00\x00\xff\x00"
            tail += _frame_block(patch, 0, 0, gce=gce)
        if tail:
            gif = gif[:-1] + tail + b";"        # splice before trailer
        return gif

    return doc_id.apply(enc)


_GIF_STATS_SCHEMA = T.StructType([
    T.StructField("gif_w", T.IntegerType()),
    T.StructField("gif_h", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_sum_all", T.LongType()),
])


@pandas_udf(_GIF_STATS_SCHEMA)
def _gif_stats_udf(gif: pd.Series) -> pd.DataFrame:
    from streamprocess_spark.functions.gif import np_decode_gif
    from streamprocess_spark.functions.image import np_png_to_gray

    rows = []
    for raw in gif:
        frames, (w, h) = np_decode_gif(bytes(raw))
        lumas = [np_png_to_gray(f).astype(np.int64) for f in frames]
        rows.append({
            "gif_w": int(w), "gif_h": int(h),
            "n_frames": len(frames),
            "px_sum": int(lumas[0].sum()),
            "px_sum_all": int(sum(p.sum() for p in lumas)),
        })
    return pd.DataFrame(rows)


@register(
    "q136_gif_ingest",
    oracle=f"""
    WITH {_BLOCK_CTE},
    dims AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 1 THEN 60
                    ELSE 160 + (doc_id % 3) * 80 END AS w,
               120 + (doc_id % 2) * 60 AS h
        FROM documents
    ),
    base AS (
        SELECT m.doc_id, m.w, m.h,
               cast(m.w * m.h * 255
                    - coalesce(sum(b.bw * 20), 0) * 215 AS BIGINT) AS px
        FROM dims m LEFT JOIN blk b USING (doc_id)
        GROUP BY m.doc_id, m.w, m.h
    )
    SELECT doc_id,
           cast(w AS INT) AS gif_w,
           cast(h AS INT) AS gif_h,
           cast(1 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END AS INT)
               AS n_frames,
           px AS px_sum,
           -- frame 2 (d%5=0) = inverted page; frame 3 (d%7=3) = the
           -- previous canvas with an 8x8 patch at (0,0), odd rows
           -- transparent: prev_total - 32*prev_bg + 32*77, where the
           -- patch region is pure background on both canvases
           cast(px
                + CASE WHEN doc_id % 5 = 0
                       THEN cast(w AS BIGINT) * h * 255 - px
                       ELSE 0 END
                + CASE WHEN doc_id % 7 = 3 THEN
                       CASE WHEN doc_id % 5 = 0
                            THEN cast(w AS BIGINT) * h * 255 - px + 2464
                            ELSE px - 5696 END
                  ELSE 0 END AS BIGINT) AS px_sum_all
    FROM base
    """,
    covers=("S15",),
    doc="GIF container ingest (S15, the web-scrape image format): "
        "pages as real GIF89a files through the from-scratch decoder "
        "(functions/gif.py — LSB-first variable-width LZW with "
        "mid-stream Clears, sub-block framing, global/local color "
        "tables, 4-pass interlace, multi-frame walks, AND the GIF89a "
        "compositing model: fixtures cycle interlaced/sequential, "
        "every 5th doc adds an inverted full frame, and every d%7==3 "
        "doc adds a PARTIAL 8x8 frame with GCE transparency that must "
        "composite onto the running canvas — wrong offset handling or "
        "transparency breaks px_sum_all). Identity gray palette makes "
        "luma == index, so every frame sum is closed-form (q92 "
        "formula; patch region is guaranteed background). Reference "
        "accepts GIFs via cv2.imdecode (ocr_worker.py:283-308). "
        "Scale: map-only, zero shuffles.",
)
def q136_gif_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("gif", _synth_gif_udf(F.col("doc_id")))
        .withColumn("s", _gif_stats_udf(F.col("gif")))
        .select(
            "doc_id",
            F.col("s.gif_w").alias("gif_w"),
            F.col("s.gif_h").alias("gif_h"),
            F.col("s.n_frames").alias("n_frames"),
            F.col("s.px_sum").alias("px_sum"),
            F.col("s.px_sum_all").alias("px_sum_all"),
        )
    )


# ---------------------------------------------------------------------------
# video path (SURVEY §2.13 multimodal: frame sampling over a video column)
# ---------------------------------------------------------------------------

VIDEO_W, VIDEO_H = 32, 24
VIDEO_AREA = VIDEO_W * VIDEO_H                   # 768
_VBLOCK_AREA = 8 * 16                            # moving block, 128 px


def _np_synth_video(d: int) -> bytes:
    """RAWV clip for doc d: nf = 8 + d%5 frames of 32x24. Frame f is a
    flat field v_f = (d*13 + f*29) % 251 with one 8x16 block of
    b_f = (v_f*3 + 17) % 251 at rows [4,12) x cols [8,24) — so the
    exact luma sum is v_f*(768-128) + b_f*128, closed-form for the
    oracle."""
    from streamprocess_spark.functions.video import np_build_rawv

    nf = 8 + d % 5
    frames = np.empty((nf, VIDEO_H, VIDEO_W), dtype=np.uint8)
    for f in range(nf):
        v = (d * 13 + f * 29) % 251
        b = (v * 3 + 17) % 251
        frames[f] = v
        frames[f, 4:12, 8:24] = b
    return np_build_rawv(frames, fps=10)


@pandas_udf(T.BinaryType())
def _synth_video_udf(doc_id: pd.Series) -> pd.Series:
    return doc_id.apply(lambda d: _np_synth_video(int(d)))


@register(
    "q93_video_frames",
    oracle="""
    WITH vid AS (SELECT doc_id, 8 + doc_id % 5 AS nf FROM documents),
    fr AS (
        SELECT v.doc_id, t.f,
               (v.doc_id * 13 + t.f * 29) % 251 AS vf
        FROM vid v, range(0, 12) t(f)
        WHERE t.f < v.nf AND t.f % 2 = 0
    ),
    s AS (
        SELECT doc_id, f,
               vf * 640 + ((vf * 3 + 17) % 251) * 128 AS luma_sum
        FROM fr
    )
    SELECT doc_id,
           cast(f AS INT) AS frame_idx,
           cast(luma_sum AS BIGINT) AS luma_sum,
           cast(abs(luma_sum - lag(luma_sum) OVER
                (PARTITION BY doc_id ORDER BY f)) AS BIGINT) AS motion
    FROM s
    """,
    covers=("§2.13-multimodal",),
    doc="Video frame sampling (SURVEY §2.13): videos are opaque binary "
        "RAWV containers (real header+raster parser, "
        "functions/video.py; MP4/WebM decode is the documented ffmpeg "
        "stub); every 2nd frame is extracted with an exact integer "
        "luma sum and a motion signal (|delta| vs previous sampled "
        "frame — the scene-change heuristic used to pick training "
        "frames). One row per sampled frame via posexplode; map-only, "
        "zero shuffle, so it scales with input splits at 100 TB.",
)
def q93_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.video import sample_frames_udf

    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("video", _synth_video_udf(F.col("doc_id")))
        .withColumn("fr", sample_frames_udf(step=2)(F.col("video")))
        .select("doc_id", F.explode("fr").alias("e"))
        .select(
            "doc_id",
            F.col("e.frame_idx").alias("frame_idx"),
            F.col("e.luma_sum").alias("luma_sum"),
            F.col("e.motion").alias("motion"),
        )
    )


# ---------------------------------------------------------------------------
# G.711 telephony ingest (S15) — integer-exact companding oracle
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_g711_udf(doc_id: pd.Series) -> pd.Series:
    """1600 formula-generated mu-law code bytes per doc (0.2 s @ 8 kHz):
    byte i = (d*17 + i*13) % 256 — covers the full 8-bit code space."""
    def synth(d: int) -> bytes:
        i = np.arange(1600, dtype=np.int64)
        return ((d * 17 + i * 13) % 256).astype(np.uint8).tobytes()

    return doc_id.apply(lambda d: synth(int(d)))


@register(
    "q96_g711_ingest",
    oracle="""
    WITH codes AS (
        SELECT d.doc_id, t.i,
               255 - ((d.doc_id * 17 + t.i * 13) % 256) AS u
        FROM documents d, range(0, 1600) t(i)
    ),
    dec AS (
        SELECT doc_id, i,
               CASE WHEN u >= 128 THEN -1 ELSE 1 END AS sgn,
               ((2 * (u & 15) + 33) * (1 << ((u >> 4) & 7))) - 33 AS mag14
        FROM codes
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_samples,
           cast(sum(sgn * mag14) AS BIGINT) AS ssum14,
           cast(sum(mag14) AS BIGINT) AS mag_sum
    FROM dec GROUP BY doc_id
    """,
    covers=("S15", "F9"),
    doc="G.711 mu-law ingest (S15): formula-generated 8-bit code bytes "
        "decoded by np_decode_mulaw (ITU-T expansion, validated "
        "bit-level against CPython audioop); the oracle re-derives the "
        "expansion with integer bit ops (invert, sign 0x80, exponent "
        "bits 4-6, mantissa bits 0-3, mag = (2m+33)<<e - 33). The "
        "14-bit magnitudes are recovered exactly from the decoded "
        "float32 via round(|x|*8159) — max float32 error is ~5e-4, far "
        "under the 0.5 rounding margin — so every sample is checked "
        "without float-division ambiguity. Map-only before the per-doc "
        "aggregation.",
)
def q96_g711_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.audio import decode_audio_udf

    docs = load_tables(spark, sf_dir)["documents"]
    mu = decode_audio_udf("MULAW", target_sr=8000)  # native G.711 rate
    # signed / absolute 14-bit magnitudes recovered from float samples
    s14 = (
        "aggregate(transform(samples, x -> cast(round(cast(x as double) "
        "* 8159.0, 0) as bigint)), cast(0 as bigint), (a, x) -> a + x)"
    )
    m14 = (
        "aggregate(transform(samples, x -> cast(round(abs(cast(x as double)) "
        "* 8159.0, 0) as bigint)), cast(0 as bigint), (a, x) -> a + x)"
    )
    return (
        docs.select("doc_id")
        .withColumn("g711", _synth_g711_udf(F.col("doc_id")))
        .withColumn("samples", mu(F.col("g711")))
        .select(
            "doc_id",
            F.size("samples").cast("bigint").alias("n_samples"),
            F.expr(s14).alias("ssum14"),
            F.expr(m14).alias("mag_sum"),
        )
    )


@register(
    "q98_video_dedup",
    oracle="""
    WITH vid AS (SELECT doc_id, 8 + doc_id % 5 AS nf FROM documents),
    fr AS (
        SELECT v.doc_id, t.f,
               (v.doc_id * 13 + t.f * 29) % 251 AS vf
        FROM vid v, range(0, 12) t(f)
        WHERE t.f < v.nf
    ),
    sig AS (
        SELECT doc_id, f,
               vf * 640 + ((vf * 3 + 17) % 251) * 128 AS luma_sum
        FROM fr
    )
    SELECT luma_sum,
           count(*)::BIGINT AS n_frames,
           count(DISTINCT doc_id)::BIGINT AS n_docs,
           cast(min(doc_id * 100 + f) AS BIGINT) AS canonical
    FROM sig
    GROUP BY luma_sum
    HAVING count(*) >= 2
    """,
    covers=("§2.13-multimodal", "§2.13-dedup"),
    doc="Cross-video frame deduplication (SURVEY §2.13): every frame of "
        "every clip is signatured (exact luma sum — the content-hash "
        "analog for the synthetic rasters, injective over the frame "
        "value formula) and exact-dup groups are collapsed with one "
        "hash groupBy, reporting cluster size, distinct source clips, "
        "and the canonical (min doc,frame) survivor — the frame-level "
        "dup pruning step of a video training-data pipeline. Scale: "
        "frame expansion happens inside the scan partition "
        "(posexplode), then ONE keyed shuffle on the signature — the "
        "same shape as document exact-dedup (operators/dedup.py) at "
        "any corpus size.",
)
def q98_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.video import sample_frames_udf

    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("video", _synth_video_udf(F.col("doc_id")))
        .withColumn("fr", sample_frames_udf(step=1)(F.col("video")))
        .select("doc_id", F.explode("fr").alias("e"))
        .select(
            "doc_id",
            F.col("e.frame_idx").alias("f"),
            F.col("e.luma_sum").alias("luma_sum"),
        )
        .groupBy("luma_sum")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.col("doc_id") * 100 + F.col("f")).alias("canonical"),
        )
        .filter(F.col("n_frames") >= 2)
        .select("luma_sum", "n_frames", "n_docs", "canonical")
    )


# ---------------------------------------------------------------------------
# FLAC compressed-audio ingest (S15) — lossless roundtrip oracle
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_flac_udf(doc_id: pd.Series) -> pd.Series:
    """Real compressed FLAC bytes per doc: PCM16 sawtooth
    x_i = ((d*31 + i*7) % 4001) - 2000, n = 1600 + (d%3)*160 samples,
    encoded with np_encode_flac (block 512 → multi-frame streams with a
    short tail frame). The linear ramp compresses ~3x through the
    order-1 fixed predictor — these are genuinely compressed payloads,
    not verbatim wrappers."""
    from streamprocess_spark.functions.flac import np_encode_flac

    def synth(d: int) -> bytes:
        n = 1600 + (d % 3) * 160
        i = np.arange(n, dtype=np.int64)
        pcm = (((d * 31 + i * 7) % 4001) - 2000).astype(np.int16)
        return np_encode_flac(pcm, sr=16000, block_size=512)

    return doc_id.apply(lambda d: synth(int(d)))


@register(
    "q100_flac_ingest",
    oracle="""
    WITH pcm AS (
        SELECT d.doc_id, t.i,
               ((d.doc_id * 31 + t.i * 7) % 4001) - 2000 AS v
        FROM documents d, range(0, 1920) t(i)
        WHERE t.i < 1600 + (d.doc_id % 3) * 160
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_samples,
           cast(sum(v) AS BIGINT) AS ssum16,
           cast(sum(abs(v)) AS BIGINT) AS mag_sum
    FROM pcm GROUP BY doc_id
    """,
    covers=("S15", "F9"),
    doc="FLAC compressed-audio ingest (S15): per-doc formula PCM16 is "
        "encoded to real multi-frame FLAC (fixed predictors + Rice "
        "residuals, CRC-8/16) and decoded back by the from-scratch "
        "NumPy decoder (functions/flac.py) through the np_decode_audio "
        "dispatch — the reference decodes FLAC via soundfile "
        "(stt_worker.py:381-394; accepted encodings "
        "protos/stream_process.proto:75-81). Losslessness makes the "
        "oracle exact: DuckDB recomputes every 16-bit sample from the "
        "synthesis formula and the integer sums must match "
        "bit-for-bit (int16/32768 is exact in float32; round() "
        "recovers the integer with ~5e-4 max error vs the 0.5 "
        "margin). Scale: map-only per-row decode before one per-doc "
        "aggregation — zero shuffles until the final groupBy.",
)
def q100_flac_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.audio import decode_audio_udf

    docs = load_tables(spark, sf_dir)["documents"]
    dec = decode_audio_udf("FLAC", target_sr=16000)  # container rate: passthrough
    s16 = (
        "aggregate(transform(samples, x -> cast(round(cast(x as double) "
        "* 32768.0, 0) as bigint)), cast(0 as bigint), (a, x) -> a + x)"
    )
    m16 = (
        "aggregate(transform(samples, x -> cast(round(abs(cast(x as double)) "
        "* 32768.0, 0) as bigint)), cast(0 as bigint), (a, x) -> a + x)"
    )
    return (
        docs.select("doc_id")
        .withColumn("flac", _synth_flac_udf(F.col("doc_id")))
        .withColumn("samples", dec(F.col("flac")))
        .select(
            "doc_id",
            F.size("samples").cast("bigint").alias("n_samples"),
            F.expr(s16).alias("ssum16"),
            F.expr(m16).alias("mag_sum"),
        )
    )


# ---------------------------------------------------------------------------
# JPEG compressed-image ingest (S15) — DC-exact constant-block oracle
# ---------------------------------------------------------------------------


def _np_synth_jpeg(d: int) -> bytes:
    """Real baseline JPEG per doc: w x h (multiples of 8, varied per
    doc) of constant 8x8 blocks, block b valued
    v = 128 + 2*(((d*7 + b)*13) % 61 - 30)  (even offsets in [68,188]).
    A constant block has only a DC coefficient; with quality 50
    (q00=16) and even (v-128), round(8(v-128)/16) is exact, so the
    lossy codec round-trips these fixtures BIT-EXACTLY and the oracle
    can recompute the pixel sum in closed form. Every 3rd doc is
    encoded PROGRESSIVE (SOF2, 6-scan spectral selection + successive
    approximation) — same quantized coefficients, so the oracle is
    encoding-invariant while the Annex G decode path stays
    driver-exercised."""
    from streamprocess_spark.functions.jpeg import (
        np_encode_jpeg_gray, np_encode_jpeg_gray_progressive,
    )

    w = 160 + (d % 3) * 16
    h = 120 + (d % 2) * 8
    nbx = w // 8
    b = np.arange((w // 8) * (h // 8), dtype=np.int64)
    vals = (128 + 2 * (((d * 7 + b) * 13) % 61 - 30)).astype(np.uint8)
    img = np.repeat(
        np.repeat(vals.reshape(h // 8, nbx), 8, axis=0), 8, axis=1
    )
    enc = np_encode_jpeg_gray_progressive if d % 3 == 2 else np_encode_jpeg_gray
    return enc(img, quality=50)


@pandas_udf(T.BinaryType())
def _synth_jpeg_udf(doc_id: pd.Series) -> pd.Series:
    return doc_id.apply(lambda d: _np_synth_jpeg(int(d)))


_JPEG_STATS_SCHEMA = T.StructType([
    T.StructField("jpeg_w", T.IntegerType()),
    T.StructField("jpeg_h", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
])


@pandas_udf(_JPEG_STATS_SCHEMA)
def _jpeg_stats_udf(raw: pd.Series) -> pd.DataFrame:
    from streamprocess_spark.functions.jpeg import np_decode_jpeg_gray

    rows = []
    for b in raw:
        img = np_decode_jpeg_gray(bytes(b))
        rows.append({
            "jpeg_w": img.shape[1],
            "jpeg_h": img.shape[0],
            "px_sum": int(img.sum(dtype=np.int64)),
        })
    return pd.DataFrame(rows)


@register(
    "q101_jpeg_ingest",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               160 + (doc_id % 3) * 16 AS w,
               120 + (doc_id % 2) * 8 AS h
        FROM documents
    ),
    blk AS (
        SELECT m.doc_id, m.w, m.h,
               128 + 2 * ((((m.doc_id * 7 + t.b) * 13) % 61) - 30) AS v
        FROM dims m, range(0, 384) t(b)
        WHERE t.b < (m.w // 8) * (m.h // 8)
    )
    SELECT doc_id,
           cast(min(w) AS INT) AS jpeg_w,
           cast(min(h) AS INT) AS jpeg_h,
           cast(sum(v) * 64 AS BIGINT) AS px_sum
    FROM blk GROUP BY doc_id
    """,
    covers=("S15",),
    doc="JPEG container ingest (S15): pages are encoded as real "
        "baseline JPEGs (functions/jpeg.py — T.81 Annex K tables, "
        "Huffman entropy coding, 0xFF stuffing) and decoded by the "
        "from-scratch marker-walking Huffman+IDCT decoder; dims come "
        "from the parsed SOF0 and the exact pixel sum proves bit-exact "
        "decode of the DC-only constant-block fixtures (the reference "
        "decodes JPEG via cv2.imdecode, ocr_worker.py:283-308). "
        "Scale: map-only per-row transform, zero shuffles.",
)
def q101_jpeg_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("jpg", _synth_jpeg_udf(F.col("doc_id")))
        .withColumn("s", _jpeg_stats_udf(F.col("jpg")))
        .select(
            "doc_id",
            F.col("s.jpeg_w").alias("jpeg_w"),
            F.col("s.jpeg_h").alias("jpeg_h"),
            F.col("s.px_sum").alias("px_sum"),
        )
    )


# ---------------------------------------------------------------------------
# q129: COLOR JPEG ingest (S15) — YCbCr 4:2:0 / 4:4:4, per-channel oracle
# ---------------------------------------------------------------------------


def _np_synth_color_jpeg(d: int) -> bytes:
    """Real baseline COLOR JPEG per doc: jw x jh (multiples of 16),
    even docs 4:2:0, odd docs 4:4:4. Luma constant per 8x8 block with
    even offsets ((v-128) % 2 == 0 → exact at luma q00=16); chroma
    constant per 16x16 tile with offsets in multiples of 17 (exact at
    chroma q00=17, and the 2x2 box downsample + replication upsample
    of a per-tile-constant plane are both exact) — so decode is
    BIT-EXACT per channel in both subsampling modes. Docs with
    d % 3 == 2 are encoded PROGRESSIVE (SOF2) with the same quantized
    coefficients — oracle unchanged, Annex G color path exercised."""
    from streamprocess_spark.functions.jpeg import (
        np_encode_jpeg_ycbcr, np_encode_jpeg_ycbcr_progressive,
    )

    jw = 48 + (d % 3) * 16
    jh = 32 + (d % 2) * 16
    nbx, nby = jw // 8, jh // 8
    ntx, nty = jw // 16, jh // 16
    yv = np.empty((nby, nbx), dtype=np.uint8)
    for by in range(nby):
        for bx in range(nbx):
            yv[by, bx] = 128 + 2 * ((d * 13 + by * 7 + bx * 3) % 61 - 30)
    cbv = np.empty((nty, ntx), dtype=np.uint8)
    crv = np.empty((nty, ntx), dtype=np.uint8)
    for ty in range(nty):
        for tx in range(ntx):
            cbv[ty, tx] = 128 + 17 * ((d + ty + tx) % 7 - 3)
            crv[ty, tx] = 128 + 17 * ((d * 2 + ty + tx * 3) % 7 - 3)
    y = np.repeat(np.repeat(yv, 8, axis=0), 8, axis=1)
    cb = np.repeat(np.repeat(cbv, 16, axis=0), 16, axis=1)
    cr = np.repeat(np.repeat(crv, 16, axis=0), 16, axis=1)
    sub = "420" if d % 2 == 0 else "444"
    enc = (np_encode_jpeg_ycbcr_progressive if d % 3 == 2
           else np_encode_jpeg_ycbcr)
    return enc(y, cb, cr, quality=50, subsample=sub)


@pandas_udf(T.BinaryType())
def _synth_color_jpeg_udf(doc_id: pd.Series) -> pd.Series:
    return doc_id.apply(lambda d: _np_synth_color_jpeg(int(d)))


_CJPEG_STATS_SCHEMA = T.StructType([
    T.StructField("jpeg_w", T.IntegerType()),
    T.StructField("jpeg_h", T.IntegerType()),
    T.StructField("y_sum", T.LongType()),
    T.StructField("cb_sum", T.LongType()),
    T.StructField("cr_sum", T.LongType()),
])


@pandas_udf(_CJPEG_STATS_SCHEMA)
def _cjpeg_stats_udf(raw: pd.Series) -> pd.DataFrame:
    from streamprocess_spark.functions.jpeg import np_decode_jpeg

    rows = []
    for b in raw:
        ycc = np_decode_jpeg(bytes(b), color_space="ycbcr")
        rows.append({
            "jpeg_w": ycc.shape[1],
            "jpeg_h": ycc.shape[0],
            "y_sum": int(ycc[..., 0].sum(dtype=np.int64)),
            "cb_sum": int(ycc[..., 1].sum(dtype=np.int64)),
            "cr_sum": int(ycc[..., 2].sum(dtype=np.int64)),
        })
    return pd.DataFrame(rows)


# shared oracle CTE: per-doc color-JPEG channel sums from the formula
_CJPEG_CTE = """
    cdims AS (
        SELECT doc_id,
               48 + (doc_id % 3) * 16 AS jw,
               32 + (doc_id % 2) * 16 AS jh
        FROM documents
    ),
    cyb AS (
        SELECT m.doc_id,
               128 + 2 * (((m.doc_id * 13 + (t.b // (m.jw // 8)) * 7
                            + (t.b % (m.jw // 8)) * 3) % 61) - 30) AS v
        FROM cdims m, range(0, 60) t(b)
        WHERE t.b < (m.jw // 8) * (m.jh // 8)
    ),
    cct AS (
        SELECT m.doc_id,
               128 + 17 * (((m.doc_id + (t.b // (m.jw // 16))
                             + (t.b % (m.jw // 16))) % 7) - 3) AS cbv,
               128 + 17 * (((m.doc_id * 2 + (t.b // (m.jw // 16))
                             + (t.b % (m.jw // 16)) * 3) % 7) - 3) AS crv
        FROM cdims m, range(0, 15) t(b)
        WHERE t.b < (m.jw // 16) * (m.jh // 16)
    ),
    cjp AS (
        SELECT y.doc_id,
               cast(sum(y.v) * 64 AS BIGINT) AS y_sum,
               cast(min(c.cb_sum) AS BIGINT) AS cb_sum,
               cast(min(c.cr_sum) AS BIGINT) AS cr_sum
        FROM cyb y JOIN (
            SELECT doc_id, sum(cbv) * 256 AS cb_sum, sum(crv) * 256 AS cr_sum
            FROM cct GROUP BY doc_id
        ) c USING (doc_id)
        GROUP BY y.doc_id
    )"""


@register(
    "q129_color_jpeg_ingest",
    oracle=f"""
    WITH {_CJPEG_CTE}
    SELECT d.doc_id,
           cast(48 + (d.doc_id % 3) * 16 AS INT) AS jpeg_w,
           cast(32 + (d.doc_id % 2) * 16 AS INT) AS jpeg_h,
           CASE WHEN d.doc_id % 2 = 0 THEN '420' ELSE '444' END AS subsample,
           j.y_sum, j.cb_sum, j.cr_sum
    FROM documents d JOIN cjp j USING (doc_id)
    """,
    covers=("S15",),
    doc="COLOR JPEG ingest (S15, the round-3 residue): real baseline "
        "YCbCr JPEGs — even docs 4:2:0, odd docs 4:4:4 — through the "
        "generalized interleaved-MCU decoder (functions/jpeg.py: "
        "per-component DC predictors, chroma qtable 1, replication "
        "upsampling). The DC-exact trick extends per channel (luma "
        "offsets even for q00=16, chroma multiples of 17 for q00=17, "
        "chroma constant per 16x16 tile so 4:2:0 box-downsampling is "
        "exact), so DuckDB recomputes EXACT per-channel pixel sums "
        "from the block formula. Reference accepts color scans via "
        "cv2.imdecode (ocr_worker.py:283-308, server.py:354). "
        "Scale: map-only per-row transform, zero shuffles.",
)
def q129_color_jpeg_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("jpg", _synth_color_jpeg_udf(F.col("doc_id")))
        .withColumn("s", _cjpeg_stats_udf(F.col("jpg")))
        .select(
            "doc_id",
            F.col("s.jpeg_w").alias("jpeg_w"),
            F.col("s.jpeg_h").alias("jpeg_h"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("420"))
            .otherwise(F.lit("444")).alias("subsample"),
            F.col("s.y_sum").alias("y_sum"),
            F.col("s.cb_sum").alias("cb_sum"),
            F.col("s.cr_sum").alias("cr_sum"),
        )
    )


# ---------------------------------------------------------------------------
# q130: MPEG audio (MP3) container probe (S15) — frame-walk oracle
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_mpeg_udf(doc_id: pd.Series) -> pd.Series:
    """Structurally-valid MPEG-1 streams per doc: layer cycles I/II/III,
    sample rate cycles the MPEG-1 set, frame count varies, every 4th
    doc carries an ID3v2 tag (exercises the syncsafe skip)."""
    from streamprocess_spark.functions.mpeg_audio import np_build_mpeg_frames

    def synth(d: int) -> bytes:
        return np_build_mpeg_frames(
            n_frames=8 + d % 7,
            layer=(d % 3) + 1,
            kbps=128,
            sr=[44100, 48000, 32000][(d // 3) % 3],
            seed=d,
            id3_title=f"doc-{d}" if d % 4 == 0 else None,
        )

    return doc_id.apply(lambda d: synth(int(d)))


_MPEG_PROBE_SCHEMA = T.StructType([
    T.StructField("layer", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("avg_kbps", T.IntegerType()),
])


@pandas_udf(_MPEG_PROBE_SCHEMA)
def _mpeg_probe_udf(raw: pd.Series) -> pd.DataFrame:
    from streamprocess_spark.functions.mpeg_audio import np_probe_mpeg_audio

    rows = []
    for b in raw:
        p = np_probe_mpeg_audio(bytes(b))
        rows.append({
            "layer": p["layer"], "sample_rate": p["sample_rate"],
            "channels": p["channels"], "n_frames": p["n_frames"],
            "duration_ms": p["duration_ms"], "avg_kbps": p["avg_kbps"],
        })
    return pd.DataFrame(rows)


@register(
    "q130_mpeg_probe",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               (doc_id % 3) + 1 AS layer,
               [44100, 48000, 32000][((doc_id // 3) % 3) + 1] AS sr,
               8 + doc_id % 7 AS nf
        FROM documents
    ),
    c AS (
        SELECT doc_id, layer, sr, nf,
               CASE WHEN layer = 1 THEN 384 ELSE 1152 END AS spf,
               CASE WHEN layer = 1 THEN (12 * 128000 // sr) * 4
                    ELSE 144 * 128000 // sr END AS flen
        FROM m
    )
    SELECT doc_id,
           cast(layer AS INT) AS layer,
           cast(sr AS INT) AS sample_rate,
           cast(1 AS INT) AS channels,
           cast(nf AS INT) AS n_frames,
           cast(nf * spf * 1000 // sr AS BIGINT) AS duration_ms,
           cast(nf * flen * 8 * sr // (nf * spf * 1000) AS INT) AS avg_kbps
    FROM c
    """,
    covers=("S15",),
    doc="MPEG audio container probe (S15 MP3 residue, the documented "
        "subset): the full ISO 11172-3 frame walk — sync, header "
        "field decode, bitrate/rate tables, exact frame-length "
        "arithmetic, ID3v2 syncsafe skip — over layer-I/II/III "
        "fixtures; the oracle recomputes frame counts, exact duration "
        "and average bitrate from the header formulas. PCM synthesis "
        "stays the documented NotImplementedError (the subband window "
        "is normative tabulated data — functions/mpeg_audio.py "
        "docstring; reference decodes via soundfile, "
        "stt_worker.py:381-394). Scale: map-only byte parsing.",
)
def q130_mpeg_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("mp3", _synth_mpeg_udf(F.col("doc_id")))
        .withColumn("p", _mpeg_probe_udf(F.col("mp3")))
        .select(
            "doc_id",
            F.col("p.layer").alias("layer"),
            F.col("p.sample_rate").alias("sample_rate"),
            F.col("p.channels").alias("channels"),
            F.col("p.n_frames").alias("n_frames"),
            F.col("p.duration_ms").alias("duration_ms"),
            F.col("p.avg_kbps").alias("avg_kbps"),
        )
    )


# ---------------------------------------------------------------------------
# q132: Ogg/Opus container probe (S15) — page-walk + TOC oracle
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_opus_udf(doc_id: pd.Series) -> pd.Series:
    """Opus-in-Ogg fixtures cycling the TOC space: config walks
    SILK/Hybrid/CELT rows (1, 14, 19 → 20/10/20 ms frames), mono and
    stereo alternate, frame-count codes 0 and 3, varying packet
    counts; every 5th doc uses payloads long enough to force 255-
    lacing chains."""
    from streamprocess_spark.functions.ogg_opus import np_build_ogg_opus

    def synth(d: int) -> bytes:
        return np_build_ogg_opus(
            n_packets=6 + d % 5,
            config=[1, 14, 19][d % 3],
            channels=1 + d % 2,
            frames_per_packet=1 if d % 4 < 2 else 2,
            payload_bytes=700 if d % 5 == 0 else 40,
            seed=d,
        )

    return doc_id.apply(lambda d: synth(int(d)))


_OPUS_PROBE_SCHEMA = T.StructType([
    T.StructField("channels", T.IntegerType()),
    T.StructField("pre_skip", T.IntegerType()),
    T.StructField("n_packets", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("toc_duration_ms", T.LongType()),
    T.StructField("modes", T.StringType()),
])


@pandas_udf(_OPUS_PROBE_SCHEMA)
def _opus_probe_udf(raw: pd.Series) -> pd.DataFrame:
    from streamprocess_spark.functions.ogg_opus import np_probe_ogg_opus

    rows = []
    for b in raw:
        p = np_probe_ogg_opus(bytes(b))
        rows.append({
            "channels": p["channels"], "pre_skip": p["pre_skip"],
            "n_packets": p["n_packets"], "duration_ms": p["duration_ms"],
            "toc_duration_ms": p["toc_duration_ms"], "modes": p["modes"],
        })
    return pd.DataFrame(rows)


@register(
    "q132_opus_probe",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               6 + doc_id % 5 AS np,
               [20, 10, 20][(doc_id % 3) + 1] AS frame_ms,
               CASE WHEN doc_id % 4 < 2 THEN 1 ELSE 2 END AS fpp,
               ['SILK', 'HYBRID', 'CELT'][(doc_id % 3) + 1] AS mode
        FROM documents
    )
    SELECT doc_id,
           cast(1 + doc_id % 2 AS INT) AS channels,
           cast(312 AS INT) AS pre_skip,
           cast(np AS INT) AS n_packets,
           cast(np * fpp * frame_ms AS BIGINT) AS duration_ms,
           cast(np * fpp * frame_ms AS BIGINT) AS toc_duration_ms,
           mode AS modes
    FROM m
    """,
    covers=("S15",),
    doc="Ogg/Opus container probe (S15 OPUS residue, the documented "
        "subset): RFC 3533 page walk with per-page Ogg CRC-32 "
        "verification, lacing reassembly incl. 255-chains, RFC 7845 "
        "OpusHead parse, and RFC 6716 TOC arithmetic giving TWO "
        "independent duration clocks (granule position vs per-packet "
        "TOC sum) that the oracle recomputes from the fixture "
        "formulas. SILK/CELT PCM stays the documented "
        "NotImplementedError (normative codebook tables — "
        "functions/ogg_opus.py docstring; reference decodes via "
        "soundfile, stt_worker.py:381-394). Scale: map-only parsing.",
)
def q132_opus_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("ogg", _synth_opus_udf(F.col("doc_id")))
        .withColumn("p", _opus_probe_udf(F.col("ogg")))
        .select(
            "doc_id",
            F.col("p.channels").alias("channels"),
            F.col("p.pre_skip").alias("pre_skip"),
            F.col("p.n_packets").alias("n_packets"),
            F.col("p.duration_ms").alias("duration_ms"),
            F.col("p.toc_duration_ms").alias("toc_duration_ms"),
            F.col("p.modes").alias("modes"),
        )
    )


# ---------------------------------------------------------------------------
# q131: AVI/MJPEG video ingest (S15) — real container, per-frame oracle
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_avi_udf(doc_id: pd.Series) -> pd.Series:
    """Real MJPEG AVIs: nf JPEG frames of per-8x8-block constant luma
    (DC-exact at quality 50), wrapped in a spec-valid RIFF container."""
    from streamprocess_spark.functions.jpeg import np_encode_jpeg_gray
    from streamprocess_spark.functions.video import np_build_avi_mjpeg

    def synth(d: int) -> bytes:
        nf = 3 + d % 4
        frames = []
        for k in range(nf):
            vals = np.empty(24, dtype=np.uint8)       # 6x4 blocks, 48x32
            for b in range(24):
                vals[b] = 128 + 2 * ((d * 17 + k * 5 + b) % 57 - 28)
            img = np.repeat(
                np.repeat(vals.reshape(4, 6), 8, axis=0), 8, axis=1
            )
            frames.append(np_encode_jpeg_gray(img, quality=50))
        return np_build_avi_mjpeg(frames, 48, 32, fps=10)

    return doc_id.apply(lambda d: synth(int(d)))


@register(
    "q131_avi_frames",
    oracle="""
    WITH fr AS (
        SELECT d.doc_id, t.k AS frame_idx,
               (SELECT sum(128 + 2 * ((d.doc_id * 17 + t.k * 5 + u.b) % 57
                                      - 28)) * 64
                FROM range(0, 24) u(b)) AS luma_sum
        FROM documents d, range(0, 7) t(k)
        WHERE t.k < 3 + d.doc_id % 4
    )
    SELECT doc_id,
           cast(frame_idx AS INT) AS frame_idx,
           cast(luma_sum AS BIGINT) AS luma_sum,
           cast(coalesce(abs(luma_sum - lag(luma_sum)
                             OVER (PARTITION BY doc_id ORDER BY frame_idx)),
                         -1) AS BIGINT) AS motion
    FROM fr
    """,
    covers=("S15",),
    doc="Real compressed video container end-to-end (round-3 stretch "
        "ask): MJPEG-in-AVI through the RIFF demuxer "
        "(functions/video.py np_demux_avi_mjpeg — LIST/avih/strh walk, "
        "idx1, totality) with every frame decoded by the repo's own "
        "baseline JPEG codec, feeding the same frame-sampling/stat "
        "operator the RAWV path uses (luma_sum exact via DC-exact "
        "fixtures, motion = |delta|). MP4/WebM stay the documented "
        "ffmpeg stub. Scale: per-row demux + posexplode inside the "
        "scan partition — zero shuffle.",
)
def q131_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.video import sample_frames_udf

    docs = load_tables(spark, sf_dir)["documents"]
    sample = sample_frames_udf(step=1, fmt="AVI")
    return (
        docs.select("doc_id")
        .withColumn("avi", _synth_avi_udf(F.col("doc_id")))
        .withColumn("fr", sample(F.col("avi")))
        .select("doc_id", F.posexplode("fr").alias("i", "f"))
        .select(
            "doc_id",
            F.col("f.frame_idx").alias("frame_idx"),
            F.col("f.luma_sum").alias("luma_sum"),
            # first frame has no predecessor: -1 sentinel, not NULL —
            # NULL-free columns hash identically across engines
            F.coalesce(F.col("f.motion"), F.lit(-1)).cast("long")
            .alias("motion"),
        )
    )


# ---------------------------------------------------------------------------
# q133: MP4 (ISO BMFF) video ingest (S15) — real container, per-frame oracle
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_mp4_udf(doc_id: pd.Series) -> pd.Series:
    """Real MP4s: the same DC-exact MJPEG frame family q131 uses,
    wrapped in a spec-valid ISO-BMFF container ('jpeg' sample entry,
    full stts/stsc/stsz/stco tables) instead of RIFF/AVI — the two
    container paths share one oracle formula."""
    from streamprocess_spark.functions.jpeg import np_encode_jpeg_gray
    from streamprocess_spark.functions.mp4 import np_build_mp4_mjpeg

    def synth(d: int) -> bytes:
        nf = 3 + d % 4
        frames = []
        for k in range(nf):
            vals = np.empty(24, dtype=np.uint8)       # 6x4 blocks, 48x32
            for b in range(24):
                vals[b] = 128 + 2 * ((d * 17 + k * 5 + b) % 57 - 28)
            img = np.repeat(
                np.repeat(vals.reshape(4, 6), 8, axis=0), 8, axis=1
            )
            frames.append(np_encode_jpeg_gray(img, quality=50))
        return np_build_mp4_mjpeg(frames, 48, 32, fps=10)

    return doc_id.apply(lambda d: synth(int(d)))


_MP4_META_SCHEMA = T.StructType([
    T.StructField("codec", T.StringType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])


@pandas_udf(_MP4_META_SCHEMA)
def _mp4_meta_udf(raw: pd.Series) -> pd.DataFrame:
    from streamprocess_spark.functions.mp4 import np_probe_mp4

    rows = []
    for b in raw:
        p = np_probe_mp4(bytes(b))
        t = p["tracks"][0]
        rows.append({
            "codec": t["codec"], "n_samples": t["n_samples"],
            "duration_ms": t["duration_ms"],
        })
    return pd.DataFrame(rows)


@register(
    "q133_mp4_frames",
    oracle="""
    WITH fr AS (
        SELECT d.doc_id, t.k AS frame_idx,
               (SELECT sum(128 + 2 * ((d.doc_id * 17 + t.k * 5 + u.b) % 57
                                      - 28)) * 64
                FROM range(0, 24) u(b)) AS luma_sum
        FROM documents d, range(0, 7) t(k)
        WHERE t.k < 3 + d.doc_id % 4
    )
    SELECT doc_id,
           'jpeg' AS codec,
           cast((3 + doc_id % 4) * 100 AS BIGINT) AS duration_ms,
           cast(frame_idx AS INT) AS frame_idx,
           cast(luma_sum AS BIGINT) AS luma_sum
    FROM fr
    """,
    covers=("S15",),
    doc="Real MP4 end-to-end (the round-3 stretch ask, upgraded from "
        "probe to decode): spec-valid ISO 14496-12 containers walked "
        "box-by-box (functions/mp4.py — ftyp/moov/mvhd/trak/mdia/"
        "stbl, full stts/stsc/stsz/stco sample-table resolution with "
        "bounds cross-checks), the 'jpeg' video track demuxed to its "
        "sample byte-ranges and every frame decoded by the repo's own "
        "baseline JPEG codec; probe metadata (codec, exact duration "
        "from the sample tables) and per-frame luma sums both "
        "oracle-checked. H.264/VP9/HEVC stay the documented "
        "NotImplementedError at the sample-decode boundary. "
        "Scale: per-row demux inside the scan partition — zero "
        "shuffle.",
)
def q133_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.video import sample_frames_udf

    docs = load_tables(spark, sf_dir)["documents"]
    sample = sample_frames_udf(step=1, fmt="MP4")
    return (
        docs.select("doc_id")
        .withColumn("mp4", _synth_mp4_udf(F.col("doc_id")))
        .withColumn("m", _mp4_meta_udf(F.col("mp4")))
        .withColumn("fr", sample(F.col("mp4")))
        .select(
            "doc_id",
            F.col("m.codec").alias("codec"),
            F.col("m.duration_ms").alias("duration_ms"),
            F.posexplode("fr").alias("i", "f"),
        )
        .select(
            "doc_id", "codec", "duration_ms",
            F.col("f.frame_idx").alias("frame_idx"),
            F.col("f.luma_sum").alias("luma_sum"),
        )
    )


# ---------------------------------------------------------------------------
# q134: Matroska/WebM video ingest (S15) — EBML walk, per-frame oracle
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_mkv_udf(doc_id: pd.Series) -> pd.Series:
    """Real Matroska files: the same DC-exact MJPEG frame family
    q131/q133 use, wrapped in EBML (V_MJPEG track, one Cluster per
    frame) — all three container paths share one oracle formula.
    DocType alternates matroska/webm."""
    from streamprocess_spark.functions.jpeg import np_encode_jpeg_gray
    from streamprocess_spark.functions.matroska import np_build_mkv_mjpeg

    def synth(d: int) -> bytes:
        nf = 3 + d % 4
        frames = []
        for k in range(nf):
            vals = np.empty(24, dtype=np.uint8)       # 6x4 blocks, 48x32
            for b in range(24):
                vals[b] = 128 + 2 * ((d * 17 + k * 5 + b) % 57 - 28)
            img = np.repeat(
                np.repeat(vals.reshape(4, 6), 8, axis=0), 8, axis=1
            )
            frames.append(np_encode_jpeg_gray(img, quality=50))
        return np_build_mkv_mjpeg(
            frames, 48, 32, fps=10,
            doctype="matroska" if d % 2 == 0 else "webm",
        )

    return doc_id.apply(lambda d: synth(int(d)))


_MKV_META_SCHEMA = T.StructType([
    T.StructField("doctype", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("n_blocks", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])


@pandas_udf(_MKV_META_SCHEMA)
def _mkv_meta_udf(raw: pd.Series) -> pd.DataFrame:
    from streamprocess_spark.functions.matroska import np_probe_matroska

    rows = []
    for b in raw:
        p = np_probe_matroska(bytes(b))
        rows.append({
            "doctype": p["doctype"], "codec": p["tracks"][0]["codec"],
            "n_blocks": p["n_blocks"], "duration_ms": p["duration_ms"],
        })
    return pd.DataFrame(rows)


@register(
    "q134_mkv_frames",
    oracle="""
    WITH fr AS (
        SELECT d.doc_id, t.k AS frame_idx,
               (SELECT sum(128 + 2 * ((d.doc_id * 17 + t.k * 5 + u.b) % 57
                                      - 28)) * 64
                FROM range(0, 24) u(b)) AS luma_sum
        FROM documents d, range(0, 7) t(k)
        WHERE t.k < 3 + d.doc_id % 4
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'matroska' ELSE 'webm' END
               AS doctype,
           'V_MJPEG' AS codec,
           cast((3 + doc_id % 4) * 100 AS BIGINT) AS duration_ms,
           cast(frame_idx AS INT) AS frame_idx,
           cast(luma_sum AS BIGINT) AS luma_sum
    FROM fr
    """,
    covers=("S15",),
    doc="Matroska/WebM end-to-end (the last container family): EBML "
        "VINT walk with parent-bounds totality (functions/matroska.py "
        "— RFC 8794 + the Matroska element registry), DocType/Info/"
        "Tracks/Cluster/SimpleBlock parse, V_MJPEG payloads decoded by "
        "the repo's JPEG codec; probe metadata (doctype, codec, exact "
        "Duration) and per-frame luma sums oracle-checked. VP8/VP9/AV1 "
        "stay the documented NotImplementedError at the block "
        "boundary. Scale: per-row demux inside the scan partition — "
        "zero shuffle.",
)
def q134_mkv_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.video import sample_frames_udf

    docs = load_tables(spark, sf_dir)["documents"]
    sample = sample_frames_udf(step=1, fmt="MKV")
    return (
        docs.select("doc_id")
        .withColumn("mkv", _synth_mkv_udf(F.col("doc_id")))
        .withColumn("m", _mkv_meta_udf(F.col("mkv")))
        .withColumn("fr", sample(F.col("mkv")))
        .select(
            "doc_id",
            F.col("m.doctype").alias("doctype"),
            F.col("m.codec").alias("codec"),
            F.col("m.duration_ms").alias("duration_ms"),
            F.posexplode("fr").alias("i", "f"),
        )
        .select(
            "doc_id", "doctype", "codec", "duration_ms",
            F.col("f.frame_idx").alias("frame_idx"),
            F.col("f.luma_sum").alias("luma_sum"),
        )
    )


# ---------------------------------------------------------------------------
# q114: cross-document audio fingerprint dedup (§2.13 multimodal dedup)
# ---------------------------------------------------------------------------


@pandas_udf(T.BinaryType())
def _synth_audio_mod_udf(doc_id: pd.Series) -> pd.Series:
    """Audio with INTENDED duplicates: doc d carries the stream of
    seed d % 50, so every 50th doc is an exact re-upload — the
    re-encoded-copy situation audio dedup exists for."""
    return doc_id.apply(lambda d: _np_synth_audio(int(d) % 50))


@register(
    "q114_audio_fingerprint_dedup",
    oracle=f"""
    WITH au AS (
        SELECT doc_id, doc_id % 50 AS dm, 10 + (doc_id % 50) % 5 AS nf
        FROM documents
    ),
    samp AS (
        SELECT a.doc_id, t.i // {FRAME} AS f,
               CASE WHEN ((t.i // {FRAME}) + a.dm) % 3 = 0 THEN 0
                    ELSE (a.dm * 31 + t.i * 7) % 1025 - 512 END AS k
        FROM au a, range(0, {FRAME} * 15) t(i)
        WHERE t.i < a.nf * {FRAME}
    ),
    fr AS (
        SELECT doc_id, f,
               sum(cast(floor((k * k) / 1048576.0 * 1000000.0) AS BIGINT))
                   AS e_fp
        FROM samp GROUP BY doc_id, f
    ),
    fp AS (
        SELECT doc_id, string_agg(e_fp, ',' ORDER BY f) AS sig
        FROM fr GROUP BY doc_id
    )
    SELECT sig,
           count(*)::BIGINT AS n_docs,
           cast(min(doc_id) AS BIGINT) AS canonical
    FROM fp GROUP BY sig
    HAVING count(*) >= 2
    """,
    covers=("§2.13-multimodal", "§2.13-dedup", "W1-adjacent"),
    doc="Cross-document audio deduplication by frame-energy "
        "fingerprint (the audio analog of q98's video frame dedup, "
        "and the shape of chromaprint-style audio matching): decode "
        "-> per-30ms-frame fixed-point energy -> ordered "
        "comma-joined signature -> ONE hash groupBy collapses exact "
        "re-uploads, reporting group size and the canonical (min "
        "doc_id) survivor. Fixture seeds repeat every 50 docs so real "
        "duplicate groups exist. Scale: framing happens inside the "
        "scan partition (array ops, no explode shuffle); the only "
        "shuffle is the signature groupBy — corpus-size-linear.",
)
def q114_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.functions.audio import decode_linear16_udf

    docs = load_tables(spark, sf_dir)["documents"]
    frame_e = (
        "transform(sequence(0, cast(size(samples)/480 as int) - 1), f -> "
        "aggregate(slice(samples, f*480 + 1, 480), cast(0 as bigint), "
        "(a, x) -> a + cast(floor(cast(x as double) * cast(x as double) "
        "* 1000000.0) as bigint)))"
    )
    return (
        docs.select("doc_id")
        .withColumn("samples", decode_linear16_udf(_synth_audio_mod_udf("doc_id")))
        .withColumn("sig", F.array_join(F.expr(frame_e), ","))
        .groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("canonical"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# q115: TIFF + PDF document-container ingest (S15) — exact-pixel oracles
# ---------------------------------------------------------------------------


def _np_synth_doc_page(d: int) -> np.ndarray:
    """Formula page for the document-container fixtures: 48x64,
    constant 8x8 blocks v = 128 + 2*(((d*11 + b)*7) % 61 - 30) — even
    offsets from 128 so the same raster is ALSO DC-exact under the
    JPEG-in-PDF (DCTDecode) path."""
    b = np.arange(6 * 8, dtype=np.int64)
    vals = (128 + 2 * (((d * 11 + b) * 7) % 61 - 30)).astype(np.uint8)
    return np.repeat(np.repeat(vals.reshape(6, 8), 8, axis=0), 8, axis=1)


@pandas_udf(T.BinaryType())
def _synth_tiff_udf(doc_id: pd.Series) -> pd.Series:
    from streamprocess_spark.functions.image import np_encode_tiff_gray

    # alternate byte orders (d%2) AND Compression none/LZW/PackBits
    # (d%3), with multi-strip layouts every 5th doc — every TIFF
    # decoder path stays driver-exercised; the pixel-sum oracle is
    # encoding-invariant
    return doc_id.apply(
        lambda d: np_encode_tiff_gray(
            _np_synth_doc_page(int(d)),
            big_endian=bool(int(d) % 2),
            compression=[1, 5, 32773][int(d) % 3],
            rows_per_strip=16 if int(d) % 5 == 0 else None,
        )
    )


@pandas_udf(T.BinaryType())
def _synth_pdf_udf(doc_id: pd.Series) -> pd.Series:
    from streamprocess_spark.functions.pdf import np_build_pdf_image

    # cycle every supported stream filter (d % 6): lossless Flate /
    # LZW / RunLength / ASCIIHex / the [ASCII85, Flate] chain, plus
    # lossy-but-DC-exact DCT — the pixel-sum oracle is filter-invariant
    _FILTERS = ("FlateDecode", "DCTDecode", "LZWDecode",
                "RunLengthDecode", "ASCIIHexDecode", "ASCII85+Flate")
    return doc_id.apply(
        lambda d: np_build_pdf_image(
            _np_synth_doc_page(int(d)), _FILTERS[int(d) % 6],
        )
    )


_DOC_PAGE_SUM_CTE = """
    page AS (
        SELECT d.doc_id,
               cast(sum(128 + 2 * ((((d.doc_id * 11 + t.b) * 7) % 61) - 30))
                    * 64 AS BIGINT) AS px_sum
        FROM documents d, range(0, 48) t(b)
        GROUP BY d.doc_id
    )"""


@pandas_udf(T.LongType())
def _tiff_sum_udf(raw: pd.Series) -> pd.Series:
    from streamprocess_spark.functions.image import np_decode_tiff_gray

    return raw.apply(
        lambda b: int(np_decode_tiff_gray(bytes(b)).sum(dtype=np.int64))
    )


_PDF_STATS_SCHEMA = T.StructType([
    T.StructField("pdf_px_sum", T.LongType()),
    T.StructField("n_pdf_images", T.LongType()),
])


@pandas_udf(_PDF_STATS_SCHEMA)
def _pdf_stats_udf(raw: pd.Series) -> pd.DataFrame:
    from streamprocess_spark.functions.pdf import np_extract_pdf_images

    rows = []
    for b in raw:
        imgs = np_extract_pdf_images(bytes(b))
        rows.append({
            "pdf_px_sum": sum(int(i.sum(dtype=np.int64)) for i in imgs),
            "n_pdf_images": len(imgs),
        })
    return pd.DataFrame(rows)


@register(
    "q115_document_containers",
    oracle=f"""
    WITH {_DOC_PAGE_SUM_CTE}
    SELECT doc_id,
           px_sum AS tiff_px_sum,
           px_sum AS pdf_px_sum,
           cast(1 AS BIGINT) AS n_pdf_images
    FROM page
    """,
    covers=("S15", "S3"),
    doc="Scanned-document container ingest (S15): the same formula "
        "page travels as (a) real TIFF — from-scratch IFD writer/"
        "reader, alternating little/big byte orders, cycling "
        "Compression 1/5(LZW)/32773(PackBits) and multi-strip "
        "layouts per doc — and "
        "(b) real single-page PDF with the page as an image XObject "
        "(functions/pdf.py), cycling every supported stream filter — "
        "lossless /FlateDecode, /LZWDecode (the TIFF §13 codec), "
        "/RunLengthDecode, /ASCIIHexDecode, the [/ASCII85Decode "
        "/FlateDecode] chain, and /DCTDecode routed through the "
        "repo's own JPEG decoder (DC-exact constant blocks). Equal "
        "pixel sums across "
        "both containers and the closed-form oracle prove bit-exact "
        "decode end-to-end (reference accepts TIFF/PDF on the OCR "
        "upload path, server.py:354). Map-only, zero shuffles.",
)
def q115_document_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id")
        .withColumn("tiff_px_sum", _tiff_sum_udf(_synth_tiff_udf("doc_id")))
        .withColumn("p", _pdf_stats_udf(_synth_pdf_udf("doc_id")))
        .select(
            "doc_id",
            "tiff_px_sum",
            F.col("p.pdf_px_sum").alias("pdf_px_sum"),
            F.col("p.n_pdf_images").alias("n_pdf_images"),
        )
    )


# ---------------------------------------------------------------------------
# q120: perceptual-hash image near-dup (the image leg of §2.13 dedup)
# ---------------------------------------------------------------------------

_AH_GRID = 8          # 8x8 block grid → 64-bit average hash
_AH_CELL = 8          # 8x8 pixels per block → 64x64 images
_AH_SEG_BITS = 16     # 4 segments → pigeonhole-exact for hamming <= 3


def _np_synth_phash_image(d: int) -> bytes:
    """64x64 GRAY8 raster for doc d: base pattern from group g = d%40
    (every 40th doc is a near-copy), with variant v = d//40 perturbing
    ONE block — the re-encoded / slightly-edited duplicate situation
    perceptual hashing exists for. All-integer so the oracle replays
    the hash in closed form."""
    g, v = d % 40, d // 40
    b = np.arange(64, dtype=np.int64)
    vals = 40 + ((g * 13 + b * 7) % 160)
    vals[(g + v) % 64] += (v % 3) * 90
    img = np.repeat(
        np.repeat(vals.reshape(_AH_GRID, _AH_GRID), _AH_CELL, 0), _AH_CELL, 1
    )
    return np.clip(img, 0, 255).astype(np.uint8).tobytes()


@pandas_udf(T.BinaryType())
def _synth_phash_udf(doc_id: pd.Series) -> pd.Series:
    return doc_id.apply(lambda d: _np_synth_phash_image(int(d)))


_AH_SEG_SCHEMA = T.StructType([
    T.StructField(f"s{i}", T.LongType()) for i in range(4)
])


@pandas_udf(_AH_SEG_SCHEMA)
def _ahash_segments_udf(raw: pd.Series) -> pd.DataFrame:
    """Average hash over the REAL raster: bit b = (block b's pixel sum
    x 64) > image pixel sum — integer cross-multiply, no float mean.
    Returned as four 16-bit segments (pigeonhole candidates; avoids
    signed-bit-63 asymmetries of a single int64 hash)."""
    rows = []
    for buf in raw:
        img = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        img = img.reshape(_AH_GRID * _AH_CELL, _AH_GRID * _AH_CELL)
        blocks = (
            img.reshape(_AH_GRID, _AH_CELL, _AH_GRID, _AH_CELL)
            .transpose(0, 2, 1, 3)
            .reshape(64, -1)
            .sum(axis=1)
        )
        bits = (blocks * 64 > img.sum()).astype(np.int64)
        segs = {
            f"s{s}": int((bits[s * 16:(s + 1) * 16]
                          << np.arange(16, dtype=np.int64)).sum())
            for s in range(4)
        }
        rows.append(segs)
    return pd.DataFrame(rows)


@register(
    "q120_image_phash_dedup",
    oracle="""
    WITH g AS (
        SELECT doc_id, doc_id % 40 AS grp, doc_id // 40 AS var
        FROM documents
    ),
    blk AS (
        SELECT g.doc_id, t.b,
               40 + ((g.grp * 13 + t.b * 7) % 160)
               + CASE WHEN t.b = (g.grp + g.var) % 64
                      THEN (g.var % 3) * 90 ELSE 0 END AS v
        FROM g, range(0, 64) t(b)
    ),
    tot AS (SELECT doc_id, sum(least(v, 255)) AS sv FROM blk GROUP BY doc_id),
    bits AS (
        SELECT b.doc_id, b.b,
               CASE WHEN least(b.v, 255) * 64 > t.sv THEN 1 ELSE 0 END AS bit
        FROM blk b JOIN tot t USING (doc_id)
    ),
    segs AS (
        SELECT doc_id, b // 16 AS seg,
               sum(bit * (1::BIGINT << (b % 16)))::BIGINT AS seg_val
        FROM bits GROUP BY doc_id, b // 16
    ),
    cand AS (
        SELECT a.doc_id AS da, b.doc_id AS db
        FROM segs a JOIN segs b
          ON a.seg = b.seg AND a.seg_val = b.seg_val AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    ham AS (
        SELECT c.da, c.db,
               sum(bit_count(xor(sa.seg_val, sb.seg_val)))::BIGINT AS h
        FROM cand c
        JOIN segs sa ON sa.doc_id = c.da
        JOIN segs sb ON sb.doc_id = c.db AND sb.seg = sa.seg
        GROUP BY 1, 2
    )
    SELECT da AS doc_a, db AS doc_b, h AS hamming
    FROM ham WHERE h <= 3
    """,
    covers=("§2.13-multimodal", "§2.13-dedup"),
    doc="Perceptual-hash image near-duplicate detection — the IMAGE "
        "leg of the dedup family (text SimHash q76, video q98, audio "
        "q114): 64-bit average hash computed from the real raster "
        "(integer cross-multiply, no float means), stored as four "
        "16-bit segments; candidate pairs from the pigeonhole "
        "segment equi-join (EXACT for hamming <= 3, never an "
        "all-pairs scan), hamming rescored per-pair as a 4-way "
        "xor-popcount. Fixtures repeat a base pattern every 40 docs "
        "with one-block perturbations, so real near-dup pairs at "
        "hamming 0-2 exist. Same scale shape as q76: bucket-local "
        "pair expansion only.",
)
def q120_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    segs_wide = (
        docs.select("doc_id")
        .withColumn("img", _synth_phash_udf(F.col("doc_id")))
        .withColumn("ah", _ahash_segments_udf(F.col("img")))
        .select("doc_id", *[F.col(f"ah.s{i}").alias(f"s{i}") for i in range(4)])
    )
    seg_arr = F.array(*[
        F.struct(F.lit(i).alias("seg"), F.col(f"s{i}").alias("seg_val"))
        for i in range(4)
    ])
    segs = segs_wide.select(
        "doc_id", F.explode(seg_arr).alias("e")
    ).select("doc_id", "e.seg", "e.seg_val")
    sa = segs.select(
        F.col("doc_id").alias("doc_a"), "seg", "seg_val"
    )
    sb = segs.select(
        F.col("doc_id").alias("doc_b"), "seg", "seg_val"
    )
    cand = (
        sa.join(sb, ["seg", "seg_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    wa = segs_wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(4)],
    )
    wb = segs_wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")))
        for i in range(4)
    )
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


# ---------------------------------------------------------------------------
# q146_h264_ipcm — real H.264 (I_PCM subset) sample decode, S15
# ---------------------------------------------------------------------------

_H264_ROW = T.StructType([
    T.StructField("n_frames", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("luma_sum", T.LongType()),
])


@pandas_udf(_H264_ROW)
def _h264_probe_udf(doc_id: pd.Series) -> pd.DataFrame:
    """Builds a spec-compliant Annex B H.264 stream (IDR pictures of
    I_PCM macroblocks, 4:2:0, frame cropping on odd doc_ids) from a
    closed-form luma formula, decodes it through the full NAL/SPS/PPS/
    slice/macroblock walk, and emits exact decoded-sample sums."""
    from streamprocess_spark.functions.h264 import (
        np_build_h264_ipcm,
        np_decode_h264_ipcm,
    )

    rows = []
    for d in doc_id.astype("int64"):
        h, w = (30, 44) if d % 2 else (32, 32)
        yy, xx = np.mgrid[0:h, 0:w]
        frames = [
            ((yy * 3 + xx * 5 + d + f) % 256).astype(np.uint8)
            for f in range(2)
        ]
        dec = np_decode_h264_ipcm(np_build_h264_ipcm(frames))
        # the same pictures through the MP4 'avc1' container (avcC
        # parameter sets + length-prefixed sample NALs) must decode
        # identically — both paths contribute to the hashed sum
        from streamprocess_spark.functions.mp4 import (
            np_build_mp4_avc1,
            np_parse_mp4_video,
        )

        mp4_dec, _ = np_parse_mp4_video(np_build_mp4_avc1(frames, fps=10))
        es_sum = int(sum(fr.sum(dtype=np.int64) for fr in dec))
        mp4_sum = int(mp4_dec.sum(dtype=np.int64))
        if mp4_sum != es_sum or len(mp4_dec) != len(dec):
            raise ValueError("avc1 container and elementary stream "
                             "decoded differently")
        rows.append({
            "n_frames": len(dec),
            "height": dec[0].shape[0],
            "width": dec[0].shape[1],
            "luma_sum": es_sum,
        })
    return pd.DataFrame(rows)


@register(
    "q146_h264_ipcm",
    oracle="""
    WITH px AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 2 = 1 THEN 30 ELSE 32 END AS h,
               CASE WHEN d.doc_id % 2 = 1 THEN 44 ELSE 32 END AS w,
               y.y, x.x, f.f
        FROM documents d, range(0, 32) y(y), range(0, 44) x(x),
             range(0, 2) f(f)
        WHERE y.y < CASE WHEN d.doc_id % 2 = 1 THEN 30 ELSE 32 END
          AND x.x < CASE WHEN d.doc_id % 2 = 1 THEN 44 ELSE 32 END
    )
    SELECT doc_id,
           cast(2 AS BIGINT) AS n_frames,
           cast(max(h) AS BIGINT) AS height,
           cast(max(w) AS BIGINT) AS width,
           cast(sum((y * 3 + x * 5 + doc_id + f) % 256) AS BIGINT)
               AS luma_sum
    FROM px GROUP BY doc_id
    """,
    covers=("S15",),
    doc="H.264/AVC sample decode — the I_PCM subset implemented from "
        "the public ITU-T spec (functions/h264.py): Annex B NAL walk "
        "with emulation prevention, Exp-Golomb entropy codes, "
        "baseline SPS/PPS, IDR slice headers, I_PCM macroblock "
        "samples, 4:2:0 frame cropping. The streams are spec-"
        "compliant (any conformant decoder plays them); compressed "
        "macroblocks (CAVLC/CABAC, spec 9.2/9.3 normative tables) "
        "remain a documented NotImplementedError that dead-letters on "
        "the ingest edge. Each picture also round-trips through the "
        "MP4 'avc1' container (avcC + length-prefixed sample NALs, "
        "functions/mp4.py) and must decode identically to the "
        "elementary stream. The oracle recomputes every decoded luma "
        "sample from the closed-form fixture formula. Map-only.",
)
def q146_h264_ipcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    return docs.withColumn("r", _h264_probe_udf(F.col("doc_id"))).select(
        "doc_id",
        F.col("r.n_frames").alias("n_frames"),
        F.col("r.height").alias("height"),
        F.col("r.width").alias("width"),
        F.col("r.luma_sum").alias("luma_sum"),
    )
