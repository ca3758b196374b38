"""Compacting keyed-upsert store for update-mode streams, backed by
the ACID commit log (io/txlog.py).

The pattern (redis_queue.py:305-314 SETEX analog): each update-mode
micro-batch emits only the keys whose aggregate changed; foreachBatch
appends them batch-stamped to the store; readers take the latest
record per key. Without maintenance the store grows by O(changed keys)
per trigger FOREVER — fine for a bounded replay, unbounded for a
long-running stream (the round-3 finding). So every `compact_every`
batches the writer rewrites latest-per-key and drops the history.

Round-4 finding: the previous implementation swapped the compacted
snapshot in with unlink-then-move — a concurrent READER (the
leaderboard's whole point) racing the swap could observe an empty or
partial store, and a crash between the unlink loop and the moves lost
the store outright. Both are cured by routing the store through
TxTable:

  - every append is one commit (version N: adds only);
  - compaction is ONE `TxTable.rewrite` commit carrying the adds for
    the latest-per-key snapshot AND the removes for every historical
    file — a reader folds the log at a pinned version and sees the
    store entirely-before or entirely-after, never mixed;
  - removed files stay on disk until `vacuum` (retention >= 1
    version), so a reader that pinned the pre-compaction snapshot
    keeps working while the swap lands;
  - a crash at any point leaves either a fully-committed version or
    an orphaned (uncommitted, invisible) data directory — never a
    half-visible store.

Concurrent-reader safety is asserted by
tests/test_update_mode.py::test_concurrent_reader_during_compaction.

  - store size stays bounded: the snapshot holds O(distinct keys +
    compact_every * changed keys/batch) rows; vacuum(retain=1) trims
    physical files one compaction cycle behind the logical snapshot;
  - read-side latest-per-key stays correct: compacted rows keep the
    compacting batch's id, later appends have strictly higher ids;
  - foreachBatch batch replays (restart recovery) re-append identical
    rows under the same batch_id; latest-per-key picks one of the
    identical candidates, so exactly-once is preserved read-side.

At cluster scale the same shape runs against Delta/Iceberg
(MERGE + OPTIMIZE); the txlog is the same protocol core (ordered
add/remove log, put-if-absent commit) over any Hadoop-FS URI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocess_spark.io.txlog import TxConflict, TxTable

DEFAULT_COMPACT_EVERY = 8
VACUUM_RETAIN_VERSIONS = 1


def latest_per_key(snap: DataFrame, key_cols: list[str]) -> DataFrame:
    """Latest record per key from a batch-stamped store snapshot."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc("batch_id"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def read_store(spark: SparkSession, store: str) -> DataFrame:
    """Snapshot-isolated read of the full (batch-stamped) store."""
    return TxTable(store).read(spark)


def read_latest(
    spark: SparkSession, store: str, key_cols: list[str]
) -> DataFrame:
    """Snapshot-isolated latest-per-key view of the store."""
    return latest_per_key(read_store(spark, store), key_cols)


def compacting_upsert_writer(
    store: str,
    key_cols: list[str],
    compact_every: int = DEFAULT_COMPACT_EVERY,
):
    """foreachBatch function: batch-stamped txlog append + periodic
    latest-per-key `rewrite` commit that keeps the store bounded and
    every concurrent read snapshot-consistent."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        table = TxTable(store)
        stamped = batch_df.withColumn("batch_id", F.lit(batch_id))
        if not table.versions():
            TxTable.create(batch_df.sparkSession, store, stamped)
        else:
            table.append(stamped)
        if batch_id % compact_every != compact_every - 1:
            return
        spark = batch_df.sparkSession
        compacted = (
            latest_per_key(table.read(spark), key_cols)
            .drop("batch_id")
            .withColumn("batch_id", F.lit(batch_id))
        )
        try:
            # one commit: adds(compacted) + removes(all prior files);
            # readers see entirely-before or entirely-after
            table.rewrite(compacted, table.latest_version())
        except TxConflict:
            return  # foreachBatch is single-writer; next cycle retries
        # physical trim: only files unreferenced since >=1 version ago
        # go — a reader pinned at the pre-compaction snapshot is safe
        table.vacuum(retain_versions=VACUUM_RETAIN_VERSIONS)

    return upsert
