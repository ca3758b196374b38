"""Bucketed table layouts — the co-located-join scale path.

At 100 TB the dominant cost of a fact↔fact equi-join (orders↔lineitem,
request↔result on job_id, doc↔embedding on doc_id) is the shuffle of
both sides. If both tables are written bucketed (and sorted) by the
join key with the same bucket count, Spark's scan satisfies the join's
hash-partitioning requirement directly: the sort-merge join planfor
has NO Exchange on either side — each task merge-joins bucket i of A
with bucket i of B where it sits.

This is the Spark-native analog of what the reference achieves by
keying Redis streams per priority and per session (data lives where it
is consumed, src/queue/redis_queue.py:42-47): pre-partition once at
write time, then every subsequent join/aggregation on that key is
shuffle-free.

Rules of use at scale:
  - bucket count is a layout contract: both sides must share it (or be
    integer multiples, which Spark can coalesce);
  - pick it for the TARGET cluster: ~2-4× total executor cores, so a
    bucket ≈ one task and no core idles;
  - sortBy(join_key) makes the merge side of SMJ spill-free;
  - groupBy(bucket_key) on a bucketed table also skips its Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a parquet table bucketed (and optionally
    sorted) by ``bucket_cols`` — the write-once step that buys every
    later join/agg on those columns its shuffle back."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With
    layouts from :func:`write_bucketed` this plans as an exchange-free
    sort-merge join (verify: no Exchange in ``.explain``)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_on] == rt[right_on], how=how)
