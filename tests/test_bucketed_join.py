"""Bucketed-layout co-location: writing both join sides bucketed by
the join key must eliminate BOTH join-side shuffles (the dominant cost
of fact↔fact joins at 100 TB). The assertion is on the physical plan:
zero Exchange operators under the sort-merge join."""

from __future__ import annotations

import re

import pytest

from streamprocess_spark.io.bucketing import colocated_join, write_bucketed
from streamprocess_spark.io.tables import load_tables
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    t = load_tables(spark, SF_DIR)
    write_bucketed(
        t["orders"], "orders_b", ["o_orderkey"], N_BUCKETS, ["o_orderkey"]
    )
    write_bucketed(
        t["lineitem"],
        "lineitem_b",
        ["l_orderkey"],
        N_BUCKETS,
        ["l_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange", plan))


def test_colocated_join_is_shuffle_free(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, "lineitem_b", "orders_b", "l_orderkey", "o_orderkey"
        )
        assert _exchanges(joined) == 0, "bucketed join still shuffles"
        # and the result is correct: every lineitem finds its order
        n_li = spark.table("lineitem_b").count()
        assert joined.count() == n_li
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_shuffles_both_sides(spark, bucketed_tables):
    """Control: the same join from raw parquet scans needs exchanges —
    proving the zero above comes from the layout, not the optimizer."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = load_tables(spark, SF_DIR)
        joined = t["lineitem"].join(
            t["orders"], t["lineitem"]["l_orderkey"] == t["orders"]["o_orderkey"]
        )
        assert _exchanges(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_groupby_on_bucket_key_is_shuffle_free(spark, bucketed_tables):
    """Aggregation on the bucket key reuses the layout too: only the
    map-side partial agg, no Exchange before the final agg."""
    agg = spark.table("lineitem_b").groupBy("l_orderkey").count()
    assert _exchanges(agg) == 0, "bucketed groupBy still shuffles"
