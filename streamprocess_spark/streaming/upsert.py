"""Compacting keyed-upsert parquet store for update-mode streams.

The pattern (redis_queue.py:305-314 SETEX analog): each update-mode
micro-batch emits only the keys whose aggregate changed; foreachBatch
appends them batch-stamped to a parquet store; readers take the latest
record per key. Without maintenance the store grows by O(changed keys)
per trigger FOREVER — fine for a bounded replay, unbounded for a
long-running stream (the round-3 finding). So every `compact_every`
batches the writer rewrites latest-per-key and drops the history:

  - store size is bounded by O(distinct keys + compact_every * changed
    keys/batch) instead of O(total triggers);
  - read-side latest-per-key stays correct: compacted rows keep the
    compacting batch's id, later appends have strictly higher ids;
  - safe without a transaction log because foreachBatch serializes
    batch boundaries (one writer), and the compacted snapshot is fully
    materialized to a side directory BEFORE any old file is unlinked.

At cluster scale the same shape runs against a transactional table
format (Delta/Iceberg MERGE + OPTIMIZE); neither is in this container,
so the swap is the Hadoop-FS rename dance.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_COMPACT_EVERY = 8


def latest_per_key(snap: DataFrame, key_cols: list[str]) -> DataFrame:
    """Latest record per key from a batch-stamped store snapshot."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc("batch_id"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def compacting_upsert_writer(
    store: str,
    key_cols: list[str],
    compact_every: int = DEFAULT_COMPACT_EVERY,
):
    """foreachBatch function: batch-stamped append + periodic
    latest-per-key rewrite that keeps the store bounded."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(store)
        if batch_id % compact_every != compact_every - 1:
            return
        spark = batch_df.sparkSession
        compacted = latest_per_key(spark.read.parquet(store), key_cols)
        side = store.rstrip("/") + f"__compact_{batch_id}"
        # materialize fully before touching the live store
        compacted.drop("batch_id").withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").parquet(side)
        # drop data files AND their hidden .crc sidecars (a stale crc
        # for a later re-created name would fail local-FS checksums)
        for f in glob.glob(os.path.join(store, "*")) + glob.glob(
            os.path.join(store, ".*")
        ):
            if os.path.isfile(f):
                os.unlink(f)
        for f in glob.glob(os.path.join(side, "*")):
            base = os.path.basename(f)
            if os.path.isfile(f) and base.endswith(".parquet"):
                shutil.move(f, os.path.join(store, f"compact-{batch_id}-{base}"))
        shutil.rmtree(side, ignore_errors=True)

    return upsert
