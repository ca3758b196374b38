"""foreachBatch routing sink (SURVEY M2, S6/S11/R1/R3): the streaming
write side of the queue — valid jobs land in a priority-partitioned
parquet layout (the XADD fan-out to per-priority streams,
redis_queue.py:117-130), unknown job types go to a dead-letter table
with error + batch provenance (moveToDeadLetter,
pkg/queue/redis_consumer.go:285-298).

Scale notes: partitionBy("priority") gives partition-pruned reads per
priority level downstream (the consumer's priority-descending drain
becomes a pruned scan, not a filter); foreachBatch writes are
idempotent per (batch_id) through normal checkpoint replay semantics
— the at-least-once + idempotent-store contract the reference gets
from XADD + SETEX."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_DIR = "valid"
DEAD_DIR = "dead_letter"


def route_to_storage(
    stream: DataFrame,
    base_dir: str,
    known_types: tuple[str, ...],
    type_col: str = "event_type",
    priority_col_name: str = "priority",
):
    """Attach a foreachBatch router to a streaming DataFrame. The
    stream must already carry `type_col` and `priority_col_name`.
    Returns the DataStreamWriter (caller starts it)."""
    valid_path = os.path.join(base_dir, VALID_DIR)
    dead_path = os.path.join(base_dir, DEAD_DIR)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        known = batch_df.filter(F.col(type_col).isin(*known_types))
        (
            known.write.mode("append")
            .partitionBy(priority_col_name)
            .parquet(valid_path)
        )
        dead = (
            batch_df.filter(~F.col(type_col).isin(*known_types))
            .withColumn("error", F.lit("unknown_job_type"))
            .withColumn("failed_batch_id", F.lit(batch_id))
        )
        dead.write.mode("append").parquet(dead_path)

    return stream.writeStream.foreachBatch(handle)
