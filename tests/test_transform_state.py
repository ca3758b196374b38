"""transformWithState running-stats operator — skip-gated: the API's
state protocol needs the protobuf package (see
streaming/transform_state.py docstring). Where protobuf exists, the
converged last revision per user must equal the batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.plans.util import fixed
from streamprocess_spark.streaming.transform_state import (
    ROCKSDB_PROVIDER,
    running_user_stats,
    transform_with_state_available,
)
from tests.conftest import SF_DIR


@pytest.mark.skipif(
    not transform_with_state_available(),
    reason="transformWithState needs google.protobuf (not in this env)",
)
def test_tws_converges_to_batch_totals(spark):
    from streamprocess_spark.streaming.core import events_stream, run_to_completion

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream, _ = events_stream(spark, SF_DIR)
        revisions = run_to_completion(running_user_stats(stream), "update")
        w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
        got = {
            r["user_id"]: (r["n_events"], r["sum_fp"])
            for r in revisions.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }
        expected = {
            r["user_id"]: (r["n"], r["s"])
            for r in load_tables(spark, SF_DIR)["events"]
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(fixed("value")).alias("s"))
            .collect()
        }
        assert got == expected
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_gate_reports_unavailable_without_protobuf():
    # in THIS container the gate must say unavailable (protobuf absent);
    # if the env gains protobuf, the real test above takes over
    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False
    assert transform_with_state_available() == has_protobuf
