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
from streamprocess_spark.functions.inference import ocr_udf, transcribe_udf
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
    ssum = _FP_SUM.format(arr="samples", val="cast(x as double)")
    sabs = _FP_SUM.format(arr="samples", val="abs(cast(x as double))")
    return _audio_df(spark, sf_dir).select(
        "doc_id",
        F.size("samples").cast("bigint").alias("n_samples"),
        F.expr(ssum).alias("ssum_fp"),
        F.expr(sabs).alias("sabs_fp"),
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
        _image_df(spark, sf_dir)
        .filter(F.col("doc_id") % 10 >= 2)
        .withColumn(
            "lines", ocr_udf(F.col("image"), F.col("width"), F.col("height"))
        )
        .select("doc_id", F.posexplode("lines").alias("idx", "l"))
        .select(
            "doc_id",
            F.col("idx").cast("bigint").alias("idx"),
            F.col("l.text").alias("text"),
            F.round(F.col("l.confidence") * 100, 0).cast("bigint").alias("conf_pct"),
        )
    )
