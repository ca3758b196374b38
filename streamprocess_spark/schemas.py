"""StructType registry for every engine entity.

Analytic substrate (TESTDATA.md / FIXTURES.md §A) plus the
reference-shaped envelopes the streaming operators consume:

  - job envelope     ≈ reference job dict (src/queue/redis_queue.py:109-122)
  - audio chunk      ≈ AudioChunk (protos/stream_process.proto:100-105)
  - transcript event ≈ TranscriptEvent (protos/stream_process.proto:114-128)
  - OCR result tree  ≈ OCRResult→TextBlock→TextLine→Word with BoundingBox
                       (protos/stream_process.proto:242-289)

Everything is declared explicitly — the reference passes free-form JSON
dicts end to end; here the proto is the source of truth and payloads go
through from_json with these schemas.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Analytic substrate tables (TESTDATA.md — schemas fixed by the driver)
# ---------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType()),
    T.StructField("r_name", T.StringType()),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType()),
    T.StructField("c_name", T.StringType()),
    T.StructField("c_nationkey", T.IntegerType()),
    T.StructField("c_acctbal", T.DoubleType()),
    T.StructField("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType()),
    T.StructField("s_name", T.StringType()),
    T.StructField("s_nationkey", T.IntegerType()),
    T.StructField("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("p_name", T.StringType()),
    T.StructField("p_brand", T.StringType()),
    T.StructField("p_type", T.StringType()),
    T.StructField("p_size", T.IntegerType()),
    T.StructField("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampType()),
    T.StructField("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_partkey", T.LongType()),
    T.StructField("l_suppkey", T.LongType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_tax", T.DoubleType()),
    T.StructField("l_returnflag", T.StringType()),
    T.StructField("l_linestatus", T.StringType()),
    T.StructField("l_shipdate", T.TimestampType()),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)

# ---------------------------------------------------------------------------
# Reference-shaped envelopes (FIXTURES.md §B)
# ---------------------------------------------------------------------------

# Job envelope — mirrors the queue job dict assembled at
# src/grpc_server/server.py:99-108 and serialized at redis_queue.py:109-122.
JOB_ENVELOPE = T.StructType([
    T.StructField("job_id", T.StringType(), False),
    T.StructField("type", T.StringType()),           # stt_chunk|stt_batch|ocr_single|ocr_batch
    T.StructField("priority", T.IntegerType()),      # 0..3 (LOW..REALTIME), proto:12-17
    T.StructField("enqueued_at", T.TimestampType()),
    T.StructField("retry_count", T.IntegerType()),
    T.StructField("deadline", T.TimestampType()),    # EDF key (stt_worker.py:173,411)
    T.StructField("payload", T.StringType()),        # JSON; from_json per type
])

# Audio chunk — AudioChunk proto (protos/stream_process.proto:100-105)
# plus the session/event-time columns the Spark rebuild needs.
AUDIO_CHUNK = T.StructType([
    T.StructField("session_id", T.StringType(), False),
    T.StructField("seq", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("offset_ms", T.LongType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("samples", T.ArrayType(T.FloatType())),
    T.StructField("is_final", T.BooleanType()),
])

# Transcript event — TranscriptEvent (protos/stream_process.proto:114-128).
TRANSCRIPT_EVENT = T.StructType([
    T.StructField("session_id", T.StringType(), False),
    T.StructField("job_id", T.StringType()),
    T.StructField("event_type", T.StringType()),     # PARTIAL|FINAL|END_OF_UTTERANCE
    T.StructField("offset_ms", T.LongType()),
    T.StructField("is_partial", T.BooleanType()),
    T.StructField("transcript", T.StringType()),
    T.StructField("confidence", T.FloatType()),
    T.StructField("language", T.StringType()),
    T.StructField("stability", T.FloatType()),
])

BOUNDING_BOX = T.StructType([
    T.StructField("x", T.IntegerType()),
    T.StructField("y", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("rotation", T.FloatType()),
])

OCR_WORD = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("confidence", T.FloatType()),
    T.StructField("bbox", BOUNDING_BOX),
])

OCR_LINE = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("confidence", T.FloatType()),
    T.StructField("bbox", BOUNDING_BOX),
    T.StructField("words", T.ArrayType(OCR_WORD)),
])

OCR_BLOCK = T.StructType([
    T.StructField("block_type", T.StringType()),     # TEXT|TITLE|TABLE|FIGURE (proto:255-264)
    T.StructField("text", T.StringType()),
    T.StructField("confidence", T.FloatType()),
    T.StructField("bbox", BOUNDING_BOX),
    T.StructField("lines", T.ArrayType(OCR_LINE)),
])

# OCR result tree — OCRResult (protos/stream_process.proto:242-289).
OCR_RESULT = T.StructType([
    T.StructField("job_id", T.StringType(), False),
    T.StructField("full_text", T.StringType()),
    T.StructField("mean_confidence", T.FloatType()),
    T.StructField("char_count", T.LongType()),
    T.StructField("word_count", T.LongType()),
    T.StructField("blocks", T.ArrayType(OCR_BLOCK)),
])

# events.props payload schema (FIXTURES.md: JSON job-envelope analog).
EVENT_PROPS = T.StructType([
    T.StructField("k", T.IntegerType()),
])
