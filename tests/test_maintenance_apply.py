"""Maintenance plans EXECUTED (round-3 ask): q119's compaction and
q109's z-order are applied to real parquet layouts and read back —
file counts actually shrink, data is bit-identical, and the rewritten
layout's per-file min/max stats actually prune."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamprocess_spark.io.maintenance import (
    apply_compaction,
    apply_linear,
    apply_zorder,
    file_minmax_stats,
    prunable_files,
)
from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.plans.util import ts_sec
from tests.conftest import SF_DIR


def _events(spark):
    return load_tables(spark, SF_DIR)["events"]


def test_compaction_apply_shrinks_files_and_preserves_data(spark, tmp_path):
    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    ev = _events(spark).select(
        "event_id", "user_id", "event_type", "value", "ts",
        F.col("ts").cast("date").alias("event_date"),
        F.floor(ts_sec("ts") / 3600.0).cast("bigint").alias("ingest_hour"),
    )
    # simulate hourly micro-batch ingest: files per (date, hour) dir —
    # the small-file pathology q119 plans against
    ev.write.partitionBy("event_date", "ingest_hour").parquet(src)
    stats = apply_compaction(
        spark, src, dst,
        partition_cols=["event_date"],
        order_col="ingest_hour",
        target_rows=2000,
    )
    assert stats["rows_after"] == stats["rows"]
    assert stats["files_after"] < stats["files_before"] / 2, stats

    # bit-identical content
    a = spark.read.parquet(src).select("event_id", "user_id", "value")
    b = spark.read.parquet(dst).select("event_id", "user_id", "value")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # time-adjacency preserved: within each partition the compacted
    # files hold contiguous, non-interleaved hour ranges, so min/max
    # hour pruning still works post-compaction
    per_file = (
        spark.read.parquet(dst)
        .withColumn("f", F.input_file_name())
        .groupBy("event_date", "f")
        .agg(F.min("ingest_hour").alias("lo"), F.max("ingest_hour").alias("hi"))
    )
    rows = per_file.collect()
    by_date: dict = {}
    for r in rows:
        by_date.setdefault(str(r.event_date), []).append((r.lo, r.hi))
    for spans in by_date.values():
        spans.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2 + 1, spans  # at most the boundary hour shared


def test_zorder_apply_prunes_both_dimensions(spark, tmp_path):
    zdir = str(tmp_path / "zorder")
    ldir = str(tmp_path / "linear")
    ev = _events(spark)
    # decorrelated id dimension: covers 0..255 even at tiny SF (too
    # few users for user_id%256) and the odd multiplier breaks the
    # event_id~time correlation that would let a time-sorted file
    # accidentally bound it
    a = ((F.col("event_id") * 131) % 256).cast("bigint")
    b = (F.floor(ts_sec("ts") / 3600.0).cast("bigint") % 256)
    apply_zorder(ev, zdir, a, b, n_files=16)
    apply_linear(ev, ldir, b, a, n_files=16)

    zs = file_minmax_stats(spark, zdir)
    ls = file_minmax_stats(spark, ldir)
    n_z = zs.count()
    n_l = ls.count()
    assert n_z >= 8 and n_l >= 8  # both actually multi-file

    # same data in both layouts
    assert (
        spark.read.parquet(zdir).count() == spark.read.parquet(ldir).count()
    )

    # user-dimension predicate: the time-linear layout cannot prune at
    # all (every file spans users 0..255); z-order reads a fraction
    z_hit = prunable_files(zs, 32, 39)
    l_hit = prunable_files(ls, 32, 39)
    assert l_hit == n_l, (l_hit, n_l)
    assert z_hit <= n_z // 2, (z_hit, n_z)

    # 2D predicate: z-order at least matches linear's time pruning
    z2 = prunable_files(zs, 32, 39, 64, 95)
    l2 = prunable_files(ls, 32, 39, 64, 95)
    assert z2 <= l2, (z2, l2)


def test_zorder_readback_spans_match_planner_claim(spark, tmp_path):
    """q109's planner claims z-order bounds BOTH per-file dimension
    spans while linear leaves user unbounded — assert it on the real
    written files, not the simulated inventory."""
    zdir = str(tmp_path / "z2")
    ldir = str(tmp_path / "l2")
    ev = _events(spark)
    # decorrelated id dimension: covers 0..255 even at tiny SF (too
    # few users for user_id%256) and the odd multiplier breaks the
    # event_id~time correlation that would let a time-sorted file
    # accidentally bound it
    a = ((F.col("event_id") * 131) % 256).cast("bigint")
    b = (F.floor(ts_sec("ts") / 3600.0).cast("bigint") % 256)
    apply_zorder(ev, zdir, a, b, n_files=16)
    apply_linear(ev, ldir, b, a, n_files=16)

    z_span = file_minmax_stats(spark, zdir).agg(
        F.max(F.col("a_max") - F.col("a_min")).alias("sa"),
    ).collect()[0].sa
    l_span = file_minmax_stats(spark, ldir).agg(
        F.max(F.col("a_max") - F.col("a_min")).alias("sa"),
    ).collect()[0].sa
    assert l_span >= 250, l_span          # linear: id dim unbounded
    assert z_span <= 160, z_span          # z-order: id dim bounded per file
