"""Lakehouse maintenance APPLY steps (§2.13 layout ops made real).

q119 plans small-file compaction and q109 scores z-order clustering —
both as queries over simulated inventories. This module executes the
same strategies against actual parquet layouts and reads the result
back, so the planner's claims (file-count reduction, min/max prune
spans) are verified on disk, not just predicted:

  - apply_compaction: next-fit bin-packing rewrite of a small-file
    table (one shuffle keyed by (partition, bin); each bin lands in
    exactly one task → one output file per bin per partition dir).
    Delta/Iceberg OPTIMIZE analog over plain parquet.
  - apply_zorder: rewrite clustered by the Morton z-value
    (repartitionByRange + sortWithinPartitions on z — the global-sort
    free layout write), vs a time-linear control layout.
  - file_minmax_stats / prunable_files: per-file min/max readback via
    input_file_name() — the skip-index statistics a scan prunes on —
    and the candidate-file count for a 2D predicate.

The transactional swap lives in io/txlog.py (the minimal Delta-shaped
commit log): a maintenance rewrite publishes {adds + removes} as ONE
atomic version, so readers see entirely-before or entirely-after —
see tests/test_txlog.py::test_zorder_rewrite_through_log_prunes for
the q109 strategy executed end-to-end through the log. Every step is
a constant number of shuffles regardless of table size —
partition-parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_ZBITS = 8


def z_value(a: Column, b: Column, bits: int = _ZBITS) -> Column:
    """Bit-interleaved Morton code of two bounded ints (codegen
    arithmetic, no UDF) — same construction as q109's planner."""
    z = None
    for i in range(bits):
        ta = ((a / (1 << i)).cast("bigint") % 2) * (1 << (2 * i + 1))
        tb = ((b / (1 << i)).cast("bigint") % 2) * (1 << (2 * i))
        z = ta + tb if z is None else z + ta + tb
    return z


def apply_compaction(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_cols: list[str],
    order_col: str,
    target_rows: int,
) -> dict:
    """Execute the q119 next-fit strategy on a real parquet layout:
    bin rows by running count within each partition (cumulative-sum
    window ordered by `order_col`, preserving time-adjacency for
    min/max pruning), then ONE shuffle keyed (partition, bin) so each
    bin becomes one output file. Returns before/after file counts."""
    before = spark.read.parquet(src)
    n_files_before = before.select(
        F.input_file_name().alias("f")
    ).distinct().count()
    n_rows = before.count()

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = before.withColumn(
        "_bin",
        F.floor(
            (F.sum(F.lit(1)).over(w) - 1) / F.lit(float(target_rows))
        ).cast("bigint"),
    )
    (
        binned.repartition(*[F.col(c) for c in partition_cols], F.col("_bin"))
        .sortWithinPartitions(*partition_cols, "_bin", order_col)
        .drop("_bin")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(dst)
    )
    after = spark.read.parquet(dst)
    n_files_after = after.select(
        F.input_file_name().alias("f")
    ).distinct().count()
    return {
        "rows": n_rows,
        "rows_after": after.count(),
        "files_before": n_files_before,
        "files_after": n_files_after,
    }


def apply_zorder(
    df: DataFrame,
    dst: str,
    a: Column,
    b: Column,
    n_files: int = 16,
) -> None:
    """Rewrite `df` z-order-clustered on (a, b): range-partition on the
    Morton key (one shuffle, no global sort) and sort within each file
    so parquet row-group min/max stats are tight on BOTH dimensions."""
    (
        df.withColumn("_a", a)
        .withColumn("_b", b)
        .withColumn("_z", z_value(F.col("_a"), F.col("_b")))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(dst)
    )


def apply_linear(df: DataFrame, dst: str, b: Column, a: Column,
                 n_files: int = 16) -> None:
    """Control layout: range-partitioned on the time dimension only."""
    (
        df.withColumn("_a", a)
        .withColumn("_b", b)
        .repartitionByRange(n_files, "_b")
        .sortWithinPartitions("_b")
        .write.mode("overwrite")
        .parquet(dst)
    )


def file_minmax_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file min/max of the clustering dimensions — the skip-index
    statistics (parquet footer analog) a pruning scan consults."""
    return (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.min("_a").alias("a_min"), F.max("_a").alias("a_max"),
            F.min("_b").alias("b_min"), F.max("_b").alias("b_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def prunable_files(
    stats: DataFrame,
    a_lo: int, a_hi: int,
    b_lo: int | None = None, b_hi: int | None = None,
) -> int:
    """How many files a min/max-pruning scan must still read for
    `a IN [a_lo, a_hi] (AND b IN [b_lo, b_hi])`."""
    cond = (F.col("a_max") >= a_lo) & (F.col("a_min") <= a_hi)
    if b_lo is not None:
        cond = cond & (F.col("b_max") >= b_lo) & (F.col("b_min") <= b_hi)
    return stats.filter(cond).count()
