"""Stateful-sessionizer queries (SURVEY M4, T1-T9). Not SQL-
expressible — the driver records rows-only checks; correctness is
covered by the batch/stream convergence suite
(tests/test_sessionizer.py), mirroring SURVEY §5's deterministic
chunk-replay strategy.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.plans.registry import register
from streamprocess_spark.streaming.core import run_to_completion
from streamprocess_spark.streaming.sessionizer import (
    CHUNK_SCHEMA,
    DEFAULT_CONFIG,
    chunks_from_events,
    sessionize_batch,
    sessionize_stream,
)


@register(
    "sessionize_batch_segments",
    oracle=None,
    covers=("T1", "T2", "T3", "T4", "T6", "T7", "F24-mock"),
    doc="Batch form of the custom stateful session operator: per-key "
        "buffer accumulation, 320 ms size trigger, energy-VAD 300 ms "
        "endpoint, 150 ms overlap carry, partial/final emission, mock "
        "transcription — applyInPandas over deterministic chunks "
        "synthesized from events.",
)
def sessionize_batch_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    chunks = chunks_from_events(ev, DEFAULT_CONFIG)
    return sessionize_batch(chunks, DEFAULT_CONFIG)


@register(
    "stream_sessionizer",
    oracle=None,
    covers=("T1", "T2", "T3", "T4", "T6", "T7", "S7", "§2.11-state"),
    doc="The real streaming form: applyInPandasWithState with state "
        "carried across micro-batches (chunk files replayed one per "
        "trigger), is_final flush dropping state. Converges to the "
        "batch form — asserted in tests/test_sessionizer.py.",
)
def stream_sessionizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    # keep the driver-run version bounded: 40 sessions is plenty to
    # exercise multi-batch state
    chunks = chunks_from_events(ev, DEFAULT_CONFIG, max_users=40)

    tmp = tempfile.mkdtemp(prefix="spchunks_")
    # several files so availableNow+maxFilesPerTrigger crosses state
    # over micro-batch boundaries
    chunks.orderBy("ts").coalesce(4).write.mode("overwrite").parquet(tmp)

    stream = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    # NoTimeout: this is a deterministic availableNow replay — the
    # armed idle reap would keep scheduling timeout batches forever
    # (see sessionize_stream docstring)
    segs = sessionize_stream(stream, DEFAULT_CONFIG, timeout="NoTimeout")
    out = run_to_completion(segs, "append")
    return out
