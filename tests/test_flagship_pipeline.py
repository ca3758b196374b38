"""Flagship §3.1 path end-to-end on ALL custom components: audio-chunk
jobs enqueued into the priority_queue DataSource (S6/S7), streamed
through the applyInPandasWithState sessionizer (T1-T9), segments
delivered to the result_store sink (S9) keyed `{session_id}_{offset}`
exactly like the reference (stt_worker.py:296-300). Converged results
must equal the batch sessionizer on the same chunks."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamprocess_spark.io.queue_source import enqueue_job, register_queue_source
from streamprocess_spark.io.result_sink import read_result, register_result_sink
from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.streaming.sessionizer import (
    DEFAULT_CONFIG,
    chunks_from_events,
    sessionize_batch,
    sessionize_stream,
)
from tests.conftest import SF_DIR

_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("offset_ms", T.LongType()),
        T.StructField("is_final", T.BooleanType()),
        T.StructField("samples", T.ArrayType(T.FloatType())),
    ]
)


def test_queue_to_sessionizer_to_result_store(spark, tmp_path):
    qdir = str(tmp_path / "q")
    rdir = str(tmp_path / "r")
    ckpt = str(tmp_path / "ckpt")

    ev = load_tables(spark, SF_DIR)["events"]
    chunks = chunks_from_events(ev, DEFAULT_CONFIG, max_users=6)

    # producer edge: chunk rows → job envelopes in the priority logs
    # (the gRPC server's enqueue path, server.py:99-108 + add_job)
    prios = ("realtime", "high", "normal", "low")
    for row in chunks.orderBy("session_id", "seq").toLocalIterator():
        enqueue_job(
            qdir,
            prios[int(row["session_id"]) % 4],
            {
                "job_id": f"{row['session_id']}-{row['seq']}",
                "type": "stt_chunk",
                "payload": {
                    "seq": row["seq"],
                    "offset_ms": row["offset_ms"],
                    "is_final": row["is_final"],
                    "samples": [float(x) for x in row["samples"]],
                },
            },
        )

    register_queue_source(spark)
    register_result_sink(spark)

    jobs = spark.readStream.format("priority_queue").option("path", qdir).load()
    chunk_stream = (
        jobs.filter(F.col("type") == "stt_chunk")
        .select(
            F.split(F.col("job_id"), "-")[0].alias("session_id"),
            F.from_json("payload", _PAYLOAD_SCHEMA).alias("p"),
        )
        .select("session_id", "p.seq", "p.offset_ms", "p.is_final", "p.samples")
    )
    segments = sessionize_stream(chunk_stream, DEFAULT_CONFIG).select(
        F.concat_ws("_", "session_id", "start_offset_ms").alias("job_id"),
        "session_id",
        "segment_idx",
        "n_samples",
        "is_partial",
        "trigger",
        "transcript",
    )
    query = (
        segments.writeStream.format("result_store")
        .option("path", rdir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        expected = {
            f"{r['session_id']}_{r['start_offset_ms']}": r
            for r in sessionize_batch(chunks, DEFAULT_CONFIG).collect()
        }
        assert expected, "batch sessionizer produced no segments"

        deadline = time.time() + 90
        missing = set(expected)
        while time.time() < deadline and missing:
            missing = {k for k in expected if read_result(rdir, k) is None}
            if missing:
                time.sleep(0.5)
        assert not missing, f"segments never delivered: {sorted(missing)[:5]}"

        for key, exp in expected.items():
            got = read_result(rdir, key)["payload"]
            assert got["transcript"] == exp["transcript"], key
            assert got["n_samples"] == exp["n_samples"], key
            assert got["trigger"] == exp["trigger"], key
    finally:
        query.stop()
