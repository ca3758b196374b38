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
from streamprocess_spark.plans.registry import QUERIES, register
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


@register(
    "q121_autoscaler_sim",
    oracle="""
    WITH RECURSIVE m AS (
        SELECT event_type AS worker_type,
               time_bucket(INTERVAL '5 minutes', cast(ts AS timestamp)) AS w,
               count(*) * 200.0 / 300.0 AS rate
        FROM events GROUP BY 1, 2
    ),
    ord AS (
        SELECT worker_type, w, rate,
               row_number() OVER (PARTITION BY worker_type ORDER BY w) AS rn,
               least(greatest(cast(ceil(rate / 0.7 / 2.0) AS BIGINT), 1), 20)
                   AS cap_t,
               epoch(w) AS ws
        FROM m
    ),
    sim(worker_type, rn, replicas, last_scale, action, target, w, rate) AS (
        SELECT worker_type, rn, cap_t,
               CASE WHEN cap_t = 1 THEN -1000000000000.0 ELSE ws END,
               CASE WHEN cap_t > 1 THEN 'scale_up' ELSE 'no_change' END,
               cap_t, w, rate
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.worker_type, o.rn,
               CASE WHEN o.ws - s.last_scale < 1800.0 THEN s.replicas
                    ELSE o.cap_t END,
               CASE WHEN o.ws - s.last_scale < 1800.0
                         OR o.cap_t = s.replicas
                    THEN s.last_scale ELSE o.ws END,
               CASE WHEN o.ws - s.last_scale < 1800.0 THEN 'no_change'
                    WHEN o.cap_t > s.replicas THEN 'scale_up'
                    WHEN o.cap_t < s.replicas THEN 'scale_down'
                    ELSE 'no_change' END,
               o.cap_t, o.w, o.rate
        FROM sim s JOIN ord o
          ON o.worker_type = s.worker_type AND o.rn = s.rn + 1
    )
    SELECT worker_type, w AS window_start, rate,
           cast(target AS BIGINT) AS target,
           cast(replicas AS BIGINT) AS replicas, action
    FROM sim
    """,
    covers=("A10", "A11-adjacent", "M-ops", "§3-control"),
    doc="Autoscaler CONTROL LOOP simulation "
        "(streaming/autoscaler.py; reference controller.py:253-330): "
        "per worker type the metric-window stream is walked in event "
        "time, a ceil-capacity target is computed per window "
        "(q_autoscale_plan's model) and scale_up/scale_down/no_change "
        "is applied under the 30-min cooldown — last_scale advances "
        "only on applied actions, the sequential recurrence that "
        "makes this a STATEFUL operator, not a window query. Runs as "
        "groupBy(worker_type).applyInPandas (sessionizer-style "
        "exception: groups are one-row-per-window tiny); the oracle "
        "replays the exact recurrence as a DuckDB recursive CTE — "
        "every decision, replica count, and cooldown suppression "
        "matches bit-for-bit.",
)
def q121_autoscaler_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.plans.util import ts_sec
    from streamprocess_spark.streaming.autoscaler import autoscaler_decisions

    ev = load_tables(spark, sf_dir)["events"]
    metrics = (
        ev.groupBy(
            F.col("event_type").alias("worker_type"),
            F.window("ts", "5 minutes").alias("win"),
        )
        .agg((F.count(F.lit(1)) * F.lit(200.0) / F.lit(300.0)).alias("rate"))
        .select(
            "worker_type",
            F.col("win.start").alias("window_start"),
            ts_sec(F.col("win.start")).alias("ws_epoch"),
            "rate",
        )
    )
    return autoscaler_decisions(metrics)


@register(
    "stream_autoscaler",
    oracle=QUERIES["q121_autoscaler_sim"].oracle,
    covers=("A10", "§2.11-stateful", "M-ops"),
    doc="Streaming twin of q121: the metric-window stream drives "
        "applyInPandasWithState keyed by worker type, with "
        "(replicas, last_scale) persisted in GroupState across "
        "micro-batches — a checkpoint-resumed run continues the "
        "cooldown exactly where it stopped. Full availableNow replay "
        "converges to the batch recurrence, so the same recursive-CTE "
        "oracle checks it.",
)
def stream_autoscaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.plans.util import ts_sec
    from streamprocess_spark.streaming.autoscaler import (
        DECISION_SCHEMA,
        autoscaler_stream_decisions,
    )

    ev = load_tables(spark, sf_dir)["events"]
    metrics = (
        ev.groupBy(
            F.col("event_type").alias("worker_type"),
            F.window("ts", "5 minutes").alias("win"),
        )
        .agg((F.count(F.lit(1)) * F.lit(200.0) / F.lit(300.0)).alias("rate"))
        .select(
            "worker_type",
            F.col("win.start").alias("window_start"),
            ts_sec(F.col("win.start")).alias("ws_epoch"),
            "rate",
        )
    )
    tmp = tempfile.mkdtemp(prefix="spautoscale_")
    metrics.coalesce(1).write.mode("overwrite").parquet(tmp)
    mstream = spark.readStream.schema(metrics.schema).parquet(tmp)
    from streamprocess_spark.streaming.core import run_to_completion

    return run_to_completion(
        autoscaler_stream_decisions(mstream), "append"
    )
