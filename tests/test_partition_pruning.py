"""Write-side partitioning → read-side partition pruning. At 100 TB
the events table is laid out hive-partitioned by (event_date,
event_type); a query touching one type/day must scan only those
directories — asserted here on the plan's PartitionFilters, plus a
directory-count check that the layout actually fanned out."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from streamprocess_spark.io.tables import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def partitioned_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_part"))
    ev = load_tables(spark, SF_DIR)["events"]
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date", "event_type")
        .parquet(out)
    )
    return out


def test_layout_fans_out_by_partition_cols(partitioned_path):
    days = [d for d in os.listdir(partitioned_path) if d.startswith("event_date=")]
    assert len(days) > 1
    types = os.listdir(os.path.join(partitioned_path, days[0]))
    assert any(t.startswith("event_type=") for t in types)


def test_filters_become_partition_filters(spark, partitioned_path):
    df = (
        spark.read.parquet(partitioned_path)
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("event_date") == "2024-01-05")
        )
        .select("event_id", "value")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both predicates act at partition level, none remain as row filters
    assert "PartitionFilters: [" in plan
    assert "= purchase)" in plan
    assert "DataFilters: []" in plan
    # and column pruning: the scan reads only the projected columns
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan


def test_pruned_count_matches_unpartitioned(spark, partitioned_path):
    ev = load_tables(spark, SF_DIR)["events"]
    expected = ev.filter(
        (F.col("event_type") == "purchase") & (F.to_date("ts") == "2024-01-05")
    ).count()
    got = (
        spark.read.parquet(partitioned_path)
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("event_date") == "2024-01-05")
        )
        .count()
    )
    assert got == expected > 0


def test_dynamic_partition_pruning_from_dim_filter(spark, partitioned_path):
    """DPP: a selective filter on a DIMENSION joined on the partition
    column must prune the fact scan at RUNTIME (the partition values
    are not known statically). At 100 TB this is the difference
    between scanning one day and scanning the table — the plan must
    carry a dynamicpruning subquery on the fact side."""
    fact = spark.read.parquet(partitioned_path)
    dim = spark.createDataFrame(
        [("purchase", "rev"), ("view", "traffic"), ("click", "traffic"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, team string",
    )
    # join on the partition column, filter on the dim only
    joined = (
        fact.join(dim, "event_type")
        .filter(F.col("team") == "rev")
        .select("event_id", "value")
    )
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized, (
        "expected a DPP subquery on the partitioned fact scan:\n" + optimized
    )
    # and it returns exactly the statically-pruned rows
    expected = fact.filter(F.col("event_type") == "purchase").count()
    assert joined.count() == expected
