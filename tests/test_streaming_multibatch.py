"""Multi-micro-batch streaming convergence (SURVEY §5 streaming
contract, T10): replaying the events table as SEVERAL time-ordered
files with maxFilesPerTrigger=1 forces state (windows, sessions,
join buffers) to be carried and merged across micro-batch boundaries —
a much stronger check than a single-batch replay. Converged results
must still equal the batch/DuckDB answer."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from streamprocess_spark.plans import QUERIES, oracle_sql_map
from streamprocess_spark.schemas import EVENTS
from streamprocess_spark.streaming.core import run_to_completion
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection

N_SPLITS = 4


@pytest.fixture(scope="module")
def split_dir(spark):
    """events.parquet split into N_SPLITS sequential time ranges, one
    file per range (file order = time order, so in-order arrival with
    state carried across batches)."""
    from streamprocess_spark.io.tables import table_path

    tmp = tempfile.mkdtemp(prefix="spsplit_")
    ev = spark.read.parquet(table_path(SF_DIR, "events"))
    tiles = ev.select(
        F.ntile(N_SPLITS).over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.orderBy("ts", "event_id")
        ).alias("tile"),
        "*",
    )
    for t in range(1, N_SPLITS + 1):
        part = tiles.filter(F.col("tile") == t).drop("tile").orderBy("ts")
        pdir = os.path.join(tmp, f"stage{t}")
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        src = next(
            f for f in os.listdir(pdir) if f.endswith(".parquet")
        )
        shutil.move(os.path.join(pdir, src), os.path.join(tmp, f"part-{t:03d}.parquet"))
        shutil.rmtree(pdir)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def _stream(spark, split_dir):
    return (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )


def test_tumbling_window_across_batches(spark, split_dir, duck):
    from streamprocess_spark.plans.util import dsum

    stream = _stream(spark, split_dir)
    agg = (
        stream.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
    )
    got = run_to_completion(agg, "complete").toPandas()
    want = duck.sql(oracle_sql_map()["stream_tumbling_window"]).df()
    assert not compare(got, want)


def test_stateful_dedup_across_batches(spark, split_dir, duck):
    stream = _stream(spark, split_dir)
    agg = (
        stream.select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_types"))
    )
    got = run_to_completion(agg, "complete").toPandas()
    want = duck.sql(oracle_sql_map()["stream_dedup_ids"]).df()
    assert not compare(got, want)


def test_multiple_micro_batches_actually_ran(spark, split_dir):
    """Guard: the split replay must produce >1 micro-batch, else the
    tests above degrade to the single-batch case."""
    from streamprocess_spark.streaming import metrics as OM

    listener = OM.attach(spark)
    try:
        stream = _stream(spark, split_dir)
        agg = stream.groupBy("event_type").count()
        run_to_completion(agg, "complete")
        import time
        for _ in range(40):
            if len(listener.metrics.batches) >= N_SPLITS:
                break
            time.sleep(0.25)
        assert len(listener.metrics.batches) >= N_SPLITS
    finally:
        OM.detach(spark, listener)


def test_autoscaler_state_continues_across_microbatches(spark, tmp_path):
    """The cooldown anchor must survive micro-batch boundaries: metrics
    split into two time-ordered files processed one per trigger give
    EXACTLY the decisions of the single-pass batch recurrence (a
    scale applied in batch 1 still suppresses actions in batch 2)."""
    import pandas as pd

    from streamprocess_spark.streaming.autoscaler import (
        COOLDOWN_S,
        autoscaler_stream_decisions,
        run_controller,
    )

    t0 = 1_700_000_000.0
    # one worker type; rates force: up at w0, cooldown-suppressed at
    # w1 (file 1) and w2 (file 2!), then down at w3 after cooldown
    rows = pd.DataFrame({
        "worker_type": ["stt"] * 4,
        "window_start": pd.to_datetime(
            [t0, t0 + 600, t0 + 1200, t0 + COOLDOWN_S], unit="s"
        ),
        "ws_epoch": [t0, t0 + 600, t0 + 1200, t0 + COOLDOWN_S],
        "rate": [6.5, 0.5, 0.5, 0.5],
    })
    src = tmp_path / "metrics"
    src.mkdir()
    schema = (
        "worker_type string, window_start timestamp, "
        "ws_epoch double, rate double"
    )
    spark.createDataFrame(rows.iloc[:2]).coalesce(1).write.parquet(
        str(src / "f0")
    )
    spark.createDataFrame(rows.iloc[2:]).coalesce(1).write.parquet(
        str(src / "f1")
    )
    mstream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/f*")
    )
    q = (
        autoscaler_stream_decisions(mstream)
        .writeStream.format("memory")
        .queryName("autoscale_mb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("autoscale_mb")
        .orderBy("window_start")
        .toPandas()
    )
    want = run_controller(rows)
    assert list(got["action"]) == list(want["action"]) == [
        "scale_up", "no_change", "no_change", "scale_down"
    ]
    assert list(got["replicas"]) == list(want["replicas"]) == [5, 5, 5, 1]


def test_local_checkpoint_profile_gated_and_settable(spark):
    """Round-10 verdict #4: the local-checkpoint deployment profile is
    env-gated (defaults byte-identical to Spark defaults) and both its
    confs exist in this Spark build and are session-settable — the
    bench A/B leg flips them at runtime. Engagement is measured, not
    assumed: the round-11 empty-trigger probe read ~170 ms/trigger
    under the profile vs ~510 ms on defaults (see HISTORY.md)."""
    import os

    from streamprocess_spark.session import (
        _LOCAL_CHECKPOINT_CONF,
        LOCAL_CHECKPOINT_PROFILE_ENV,
        local_checkpoint_profile_conf,
    )

    assert not os.environ.get(LOCAL_CHECKPOINT_PROFILE_ENV)
    assert local_checkpoint_profile_conf() == {}
    os.environ[LOCAL_CHECKPOINT_PROFILE_ENV] = "1"
    try:
        assert local_checkpoint_profile_conf() == _LOCAL_CHECKPOINT_CONF
    finally:
        del os.environ[LOCAL_CHECKPOINT_PROFILE_ENV]
    saved = {}
    try:
        for k, v in _LOCAL_CHECKPOINT_CONF.items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            spark.conf.set(k, v)   # must not raise (runtime-settable)
            assert spark.conf.get(k) == v
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
