"""Checkpoint recovery = the reference's ack/offset-commit semantics
(SURVEY S7/S8: XREADGROUP + XACK → Structured Streaming offset log).
A streaming aggregation is run over a growing directory with the SAME
checkpoint: the second run must pick up exactly the new files — no
reprocessing (no double counts), no loss."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from streamprocess_spark.schemas import EVENTS
from tests.conftest import SF_DIR


def test_exactly_once_across_restarts(spark):
    from streamprocess_spark.io.tables import table_path

    base = tempfile.mkdtemp(prefix="spckptres_")
    src_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir)
    try:
        ev = spark.read.parquet(table_path(SF_DIR, "events"))
        first = ev.filter(F.col("event_id") % 2 == 0)
        second = ev.filter(F.col("event_id") % 2 == 1)
        first.coalesce(1).write.parquet(os.path.join(base, "s1"))
        shutil.move(
            next(
                os.path.join(base, "s1", f)
                for f in os.listdir(os.path.join(base, "s1"))
                if f.endswith(".parquet")
            ),
            os.path.join(src_dir, "a.parquet"),
        )

        def run_once():
            stream = spark.readStream.schema(EVENTS).parquet(src_dir)
            counts = stream.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n")
            )
            name = "ckptsink_" + uuid.uuid4().hex[:8]
            q = (
                counts.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                r.event_type: r.n for r in spark.table(name).collect()
            }

        got1 = run_once()
        want1 = {
            r.event_type: r.n
            for r in first.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got1 == want1

        # "restart": new files arrive, same checkpoint — state resumes
        second.coalesce(1).write.parquet(os.path.join(base, "s2"))
        shutil.move(
            next(
                os.path.join(base, "s2", f)
                for f in os.listdir(os.path.join(base, "s2"))
                if f.endswith(".parquet")
            ),
            os.path.join(src_dir, "b.parquet"),
        )
        got2 = run_once()
        want2 = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # exactly-once: totals equal the full batch answer — the first
        # file was not re-read (which would double counts) nor skipped
        assert got2 == want2
    finally:
        shutil.rmtree(base, ignore_errors=True)
