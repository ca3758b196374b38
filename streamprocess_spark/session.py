"""SparkSession factory.

Scale rationale (targets a 1000-executor cluster even though tests run
on local[N]):
  - AQE on: runtime partition coalescing, skew-join splitting, dynamic
    join selection — the reference hand-tunes batch sizes
    (src/config.py:107-112); AQE is the Spark-native equivalent.
  - shuffle.partitions sized to cores locally; on a real cluster this
    is overridden (or left to AQE's coalescing from a high initial
    value).
  - Arrow enabled + bounded batch size: every pandas UDF transfer is
    vectorized; maxRecordsPerBatch mirrors the reference's dynamic
    batcher cap (Triton preferred_batch_size,
    triton/models/*/config.pbtxt:29-33).
  - session timezone pinned UTC so event-time windows are engine- and
    host-independent (the DuckDB oracle is timezone-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "streamprocess-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
