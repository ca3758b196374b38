"""foreachBatch routing sink test (S6/S11): replay events as a
stream, route through the priority-partitioned valid sink + the
dead-letter sink, and reconcile the on-disk result with the batch
answer."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from streamprocess_spark.streaming.core import events_stream
from streamprocess_spark.streaming.routing import (
    DEAD_DIR,
    VALID_DIR,
    route_to_storage,
)
from tests.conftest import SF_DIR

KNOWN = ("click", "view", "purchase", "signup")  # 'error' -> dead letter


def test_priority_routing_and_dead_letter(spark):
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.plans.dataflow import priority_col

    base = tempfile.mkdtemp(prefix="sproute_")
    ckpt = os.path.join(base, "ckpt_" + uuid.uuid4().hex[:8])
    try:
        stream, _ = events_stream(spark, SF_DIR)
        routed = stream.withColumn("priority", priority_col(F.col("event_type")))
        q = (
            route_to_storage(routed, base, KNOWN)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        ev = load_tables(spark, SF_DIR)["events"]
        n_known = ev.filter(F.col("event_type").isin(*KNOWN)).count()
        n_dead = ev.filter(~F.col("event_type").isin(*KNOWN)).count()

        valid = spark.read.parquet(os.path.join(base, VALID_DIR))
        dead = spark.read.parquet(os.path.join(base, DEAD_DIR))

        assert valid.count() == n_known
        assert dead.count() == n_dead
        assert n_dead > 0  # 'error' events exist in the fixture

        # physical layout: hive-partitioned by priority -> pruned scans
        pdirs = {
            d for d in os.listdir(os.path.join(base, VALID_DIR))
            if d.startswith("priority=")
        }
        assert len(pdirs) >= 2
        # dead letters carry provenance
        row = dead.select("error", "failed_batch_id").first()
        assert row.error == "unknown_job_type"
        assert row.failed_batch_id >= 0
        # per-priority counts reconcile with the batch computation
        got = {
            (r.priority, r.n) for r in
            valid.groupBy("priority").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        want = {
            (r.priority, r.n) for r in
            ev.filter(F.col("event_type").isin(*KNOWN))
            .withColumn("priority", priority_col(F.col("event_type")))
            .groupBy("priority").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)
