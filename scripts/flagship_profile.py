#!/usr/bin/env python
"""Flagship sessionizer stage attribution (round-12 verdict #1).

Runs the bench's flagship legs (even / rocksdb, optionally scale) with
the exact _flagship_once pipeline and records EVERY micro-batch's
StreamingQueryProgress durationMs breakdown plus stateOperators commit
metrics — the engine's own stage-level attribution of where a trigger
spends its time (triggerExecution = addBatch [source scan + shuffle +
applyInPandasWithState + sink] + walCommit + commitOffsets +
queryPlanning + getBatch/latestOffset planning).

Usage:
  python scripts/flagship_profile.py [--legs even,rocksdb] [--streams 100]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile_leg(spark, chunks, label: str, provider: str | None,
                extra_conf: dict | None = None) -> dict:
    from pyspark.sql import functions as F

    from streamprocess_spark.io.queue_source import (
        enqueue_job, register_queue_source,
    )
    from streamprocess_spark.io.result_sink import register_result_sink
    from streamprocess_spark.streaming.sessionizer import (
        DEFAULT_CONFIG, sessionize_batch, sessionize_stream,
    )

    qdir = tempfile.mkdtemp(prefix="spprofq_")
    expected_n = sessionize_batch(chunks, DEFAULT_CONFIG).count()
    prios = ("realtime", "high", "normal", "low")
    n_chunks = 0
    t_enq = time.perf_counter()
    for row in chunks.orderBy("session_id", "seq").toLocalIterator():
        n_chunks += 1
        enqueue_job(qdir, prios[int(row["session_id"]) % 4], {
            "job_id": f"{row['session_id']}-{row['seq']}",
            "type": "stt_chunk",
            "payload": {
                "seq": row["seq"], "offset_ms": row["offset_ms"],
                "is_final": row["is_final"],
                "samples": [float(x) for x in row["samples"]],
            },
        })
    t_enq = time.perf_counter() - t_enq

    register_queue_source(spark)
    register_result_sink(spark)
    payload_schema = (
        "seq long, offset_ms long, is_final boolean, samples array<float>"
    )
    jobs = (spark.readStream.format("priority_queue")
            .option("path", qdir).load())
    chunk_stream = (
        jobs.filter(F.col("type") == "stt_chunk")
        .select(
            F.split(F.col("job_id"), "-")[0].alias("session_id"),
            F.from_json("payload", payload_schema).alias("p"),
        )
        .select("session_id", "p.seq", "p.offset_ms", "p.is_final",
                "p.samples")
    )
    segments = sessionize_stream(chunk_stream, DEFAULT_CONFIG).select(
        F.concat_ws("_", "session_id", "start_offset_ms").alias("job_id"),
        F.to_json(F.struct("segment_idx", "n_samples", "trigger")).alias(
            "payload"),
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved_conf: dict[str, str | None] = {}
    to_set = dict(extra_conf or {})
    if provider:
        to_set[provider_key] = provider
    for ck, cv in to_set.items():
        try:
            saved_conf[ck] = spark.conf.get(ck)
        except Exception:
            saved_conf[ck] = None
        spark.conf.set(ck, cv)

    out: dict = {"label": label, "expected": expected_n,
                 "n_chunks": n_chunks, "enqueue_s": round(t_enq, 2),
                 "runs": []}
    try:
        for _run in range(2):
            rdir = tempfile.mkdtemp(prefix="spprofr_")
            ckpt = tempfile.mkdtemp(prefix="spprofck_")
            t0 = time.perf_counter()
            t_start_done = None
            query = (segments.writeStream.format("result_store")
                     .option("path", rdir)
                     .option("checkpointLocation", ckpt)
                     .trigger(processingTime="200 milliseconds")
                     .start())
            t_start_done = time.perf_counter() - t0
            try:
                deadline = time.time() + 300
                delivered = 0
                while time.time() < deadline:
                    delivered = sum(
                        1 for f in os.listdir(rdir) if f.endswith(".json"))
                    if delivered >= expected_n:
                        break
                    time.sleep(0.05)
                el = time.perf_counter() - t0
                # drain to idle trigger
                drain_deadline = time.time() + 60
                while time.time() < drain_deadline:
                    lp = query.lastProgress
                    if lp is not None and int(lp.get("numInputRows", -1)) == 0:
                        break
                    time.sleep(0.05)
                progress = [json.loads(p.json) if hasattr(p, "json") else p
                            for p in query.recentProgress]
            finally:
                query.stop()
            batches = []
            for p in progress:
                if isinstance(p, str):
                    p = json.loads(p)
                dm = p.get("durationMs", {})
                so = p.get("stateOperators") or [{}]
                s0 = so[0] if so else {}
                cust = s0.get("customMetrics", {})
                batches.append({
                    "batchId": p.get("batchId"),
                    "rows": p.get("numInputRows"),
                    "durationMs": dm,
                    "state": {
                        "commitTimeMs": s0.get("commitTimeMs"),
                        "timeToUpdate": cust.get(
                            "loadedMapCacheHitCount",
                            cust.get("rocksdbCommitWriteBatchLatency")),
                        "rocksdbCommitLatency": {
                            k: v for k, v in cust.items()
                            if "Latency" in k or "TimeMs" in k or
                               "FilesCopied" in k or "BytesCopied" in k
                        } if cust else {},
                        "numRowsUpdated": s0.get("allUpdatesTimeMs"),
                        "allUpdatesTimeMs": s0.get("allUpdatesTimeMs"),
                        "allRemovalsTimeMs": s0.get("allRemovalsTimeMs"),
                    },
                })
            out["runs"].append({
                "wall_s": round(el, 2),
                "start_overhead_s": round(t_start_done, 2),
                "delivered": delivered,
                "batches": batches,
            })
            for d in (rdir, ckpt):
                shutil.rmtree(d, ignore_errors=True)
    finally:
        for ck, cv in saved_conf.items():
            if cv is not None:
                spark.conf.set(ck, cv)
            else:
                spark.conf.unset(ck)
        shutil.rmtree(qdir, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="even,rocksdb")
    ap.add_argument("--streams", type=int, default=100)
    ap.add_argument("--dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--conf", action="append", default=[],
                    help="extra k=v conf applied to every leg")
    args = ap.parse_args()

    from streamprocess_spark import get_spark
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.streaming.sessionizer import (
        DEFAULT_CONFIG, chunks_from_events,
    )

    spark = get_spark(app_name="flagship-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_tables(spark, args.dir)["events"]
    chunks = chunks_from_events(ev, DEFAULT_CONFIG, max_users=args.streams)

    rocks = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    extra = dict(kv.split("=", 1) for kv in args.conf)
    results = []
    for leg in args.legs.split(","):
        leg = leg.strip()
        provider = rocks if "rocksdb" in leg else None
        r = profile_leg(spark, chunks, leg, provider, extra)
        results.append(r)
        print(json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
