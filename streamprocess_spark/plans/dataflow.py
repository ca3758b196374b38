"""Queue/dispatch dataflow semantics as declarative queries
(SURVEY §2.1-§2.2, §2.4, M2).

The reference's queue behaviors — priority routing, job-type dispatch,
retry-with-demotion, dead-lettering, EDF ordering, request↔result
correlation — re-expressed as pure DataFrame transforms over the
`events` table, which stands in for the job stream (event_type ≈ job
type, user_id ≈ session, ts ≈ enqueued_at, props ≈ JSON payload).

Everything here is batch-checkable against DuckDB; the same transforms
are reused by streaming.queue_flow on a readStream input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.plans.registry import register
from streamprocess_spark.plans.util import dsum, sql_dsum
from streamprocess_spark.schemas import EVENT_PROPS

# Priority mapping (reference: Priority enum LOW=0..REALTIME=3,
# protos/stream_process.proto:12-17; routing redis_queue.py:117-118).
PRIORITY_OF_TYPE = {
    "error": 3,     # REALTIME
    "purchase": 2,  # HIGH
    "signup": 1,    # NORMAL
    # click/view (and unknown) default LOW=0, mirroring default-normal
    # routing at redis_queue.py:117-118
}

# Dispatch table (reference: stt_worker.py:115-137, ocr_worker.py:118-146;
# unknown type → nack-no-retry → dead letter).
HANDLER_OF_TYPE = {
    "click": "stt_chunk",
    "view": "stt_batch",
    "purchase": "ocr_single",
    "signup": "ocr_batch",
}


def priority_col(etype: Column) -> Column:
    expr = F.lit(0)
    for k, v in PRIORITY_OF_TYPE.items():
        expr = F.when(etype == k, F.lit(v)).otherwise(expr)
    return expr.cast("int")


def handler_col(etype: Column) -> Column:
    expr = F.lit("dead_letter")
    for k, v in HANDLER_OF_TYPE.items():
        expr = F.when(etype == k, F.lit(v)).otherwise(expr)
    return expr


_PRIO_SQL = (
    "CASE event_type WHEN 'error' THEN 3 WHEN 'purchase' THEN 2 "
    "WHEN 'signup' THEN 1 ELSE 0 END"
)
_HANDLER_SQL = (
    "CASE event_type WHEN 'click' THEN 'stt_chunk' WHEN 'view' THEN 'stt_batch' "
    "WHEN 'purchase' THEN 'ocr_single' WHEN 'signup' THEN 'ocr_batch' "
    "ELSE 'dead_letter' END"
)


@register(
    "q11_priority_routing",
    oracle=f"""
    SELECT {_PRIO_SQL} AS priority,
           count(*) AS n_jobs,
           {sql_dsum('value', 'total_value')}
    FROM events
    GROUP BY 1
    """,
    covers=("R1", "R2", "O1", "A5"),
    doc="Priority fan-out routing + per-stream depth (redis_queue.py:42-47,"
        "117-118,346-362). At scale: write side becomes partitionBy(priority).",
)
def q11_priority_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.withColumn("priority", priority_col(F.col("event_type")))
        .groupBy("priority")
        .agg(F.count(F.lit(1)).alias("n_jobs"), dsum("value", "total_value"))
    )


@register(
    "q12_job_dispatch",
    oracle=f"""
    SELECT {_HANDLER_SQL} AS handler, count(*) AS n_jobs
    FROM events
    GROUP BY 1
    """,
    covers=("R3", "S11"),
    doc="Job-type dispatch with unknown→dead_letter "
        "(stt_worker.py:115-137; redis_consumer.go:285-298).",
)
def q12_job_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.withColumn("handler", handler_col(F.col("event_type")))
        .groupBy("handler")
        .agg(F.count(F.lit(1)).alias("n_jobs"))
    )


@register(
    "q13_retry_demotion",
    oracle=f"""
    WITH jobs AS (
        SELECT event_id,
               {_PRIO_SQL} AS priority,
               cast(event_id % 5 AS int) AS retry_count
        FROM events
    )
    SELECT greatest(priority - retry_count, 0) AS demoted_priority,
           (retry_count > 3) AS dead_lettered,
           count(*) AS n_jobs,
           min(event_id) AS first_job
    FROM jobs
    GROUP BY 1, 2
    """,
    covers=("S11", "S12", "P14"),
    doc="Retry bookkeeping with priority demotion and dead-letter after "
        "max retries (redis_queue.py:278-303: requeue at priority-1, "
        "≤3 retries; redis_consumer.go:258-298).",
)
def q13_retry_demotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    jobs = ev.select(
        "event_id",
        priority_col(F.col("event_type")).alias("priority"),
        (F.col("event_id") % 5).cast("int").alias("retry_count"),
    )
    return (
        jobs.select(
            F.greatest(F.col("priority") - F.col("retry_count"), F.lit(0)).alias(
                "demoted_priority"
            ),
            (F.col("retry_count") > 3).alias("dead_lettered"),
            "event_id",
        )
        .groupBy("demoted_priority", "dead_lettered")
        .agg(F.count(F.lit(1)).alias("n_jobs"), F.min("event_id").alias("first_job"))
    )


@register(
    "q14_json_envelope",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE cast(json_extract_string(props, '$.k') AS int) > 50)
               AS n_high_k,
           cast(sum(cast(json_extract_string(props, '$.k') AS bigint)) AS bigint)
               AS total_k
    FROM events
    GROUP BY event_type
    """,
    covers=("R4", "R6", "§2.10-json"),
    doc="JSON job-envelope decode via from_json with explicit schema "
        "(redis_queue.py:122 json envelope; defensive .get() access "
        "stt_worker.py:141-145 → permissive parse).",
)
def q14_json_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    parsed = ev.withColumn("p", F.from_json("props", EVENT_PROPS))
    return parsed.groupBy("event_type").agg(
        F.count(F.when(F.col("p.k") > 50, 1)).alias("n_high_k"),
        F.sum(F.col("p.k").cast("bigint")).alias("total_k"),
    )


@register(
    "q15_edf_order",
    oracle="""
    SELECT event_id, user_id, ts AS deadline
    FROM events
    ORDER BY ts, event_id
    LIMIT 100
    """,
    covers=("B2", "O2"),
    doc="Earliest-deadline-first batch ordering (EDF scheduler contract, "
        "stt_worker.py:173,411): sort by deadline with unique tie-break, "
        "take the batch head. Plans as TakeOrderedAndProject (no full sort).",
)
def q15_edf_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.select("event_id", "user_id", F.col("ts").alias("deadline"))
        .orderBy(F.asc("deadline"), F.asc("event_id"))
        .limit(100)
    )


@register(
    "q16_length_bucketing",
    oracle="""
    SELECT CASE WHEN n_chars <= 128 THEN 128
                WHEN n_chars <= 256 THEN 256
                WHEN n_chars <= 384 THEN 384
                WHEN n_chars <= 512 THEN 512
                ELSE 2147483647 END AS bucket,
           count(*) AS n_docs,
           cast(sum(n_chars) AS bigint) AS total_chars,
           cast(sum(CASE WHEN n_chars <= 128 THEN 128
                WHEN n_chars <= 256 THEN 256
                WHEN n_chars <= 384 THEN 384
                WHEN n_chars <= 512 THEN 512
                ELSE 2147483647 END - n_chars) AS bigint) AS padding_waste
    FROM documents
    GROUP BY 1
    """,
    covers=("B3", "B4", "B5", "P3"),
    doc="Length bucketing to cut padding waste (_bucket_by_length, "
        "stt_worker.py:359-379; size buckets ocr_worker.py:412-434). "
        "The padding_waste column is exactly what the buckets minimize. "
        "At scale: repartition('bucket') co-locates equal-length items "
        "so Arrow batches are padding-efficient.",
)
def q16_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = (
        F.when(F.col("n_chars") <= 128, 128)
        .when(F.col("n_chars") <= 256, 256)
        .when(F.col("n_chars") <= 384, 384)
        .when(F.col("n_chars") <= 512, 512)
        .otherwise(2147483647)
    )
    return (
        docs.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("bucket") - F.col("n_chars")).alias("padding_waste"),
        )
    )


@register(
    "q17_request_result_join",
    oracle="""
    SELECT r.user_id,
           count(*) AS n_matched,
           min(r.event_id) AS first_request
    FROM events r JOIN events s
      ON r.user_id = s.user_id
     AND s.ts > r.ts AND s.ts <= r.ts + INTERVAL 1 HOUR
    WHERE r.event_type = 'view' AND s.event_type = 'purchase'
    GROUP BY r.user_id
    """,
    covers=("J1", "T11", "S10"),
    doc="Request↔result correlation as an interval join: each 'view' "
        "request matched to 'purchase' results within 1 h "
        "(wait_for_result, redis_queue.py:329-344). Streaming analog = "
        "watermarked stream-stream join (streaming.joins).",
)
def q17_request_result_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    req = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    res = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"),
    )
    joined = req.join(
        res,
        (F.col("r_user") == F.col("s_user"))
        & (F.col("s_ts") > F.col("r_ts"))
        & (F.col("s_ts") <= F.col("r_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.groupBy(F.col("r_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.min("r_id").alias("first_request"),
    )


@register(
    "q18_zip_explode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 20
    """,
    covers=("J2", "§2.12-UDTF"),
    doc="Positional zip of batch items with per-item results "
        "(zip(bucket_items, results), stt_worker.py:289-300) via "
        "posexplode — one row per (doc, position, token).",
)
def q18_zip_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("bigint"))
    )


@register(
    "q19_batch_formation",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) - 1 AS seq,
               event_id
        FROM events
    )
    SELECT event_type,
           cast(seq // 16 AS BIGINT) AS batch_id,
           count(*)::BIGINT AS n_items,
           cast(min(event_id) AS BIGINT) AS first_item,
           cast(max(event_id) AS BIGINT) AS last_item
    FROM seq GROUP BY event_type, seq // 16
    """,
    covers=("B1", "B6", "B7-shape"),
    doc="Dynamic batch formation (BatchAggregator contract, "
        "stt_worker.py:79-84 max_batch_size=16; server-side coalescing "
        "cmd/grpc-server/main.go:155-174): arrival-ordered items per "
        "job type grouped into batches of <=16. Every batch holds 16 "
        "items except each type's tail — the invariant the reference's "
        "size trigger enforces. At scale the analog is Arrow batch "
        "sizing (spark.sql.execution.arrow.maxRecordsPerBatch), not a "
        "driver-side loop.",
)
def q19_batch_formation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("seq", F.row_number().over(w) - 1)
        .withColumn("batch_id", (F.col("seq") / 16).cast("bigint"))
        .groupBy("event_type", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("event_id").alias("first_item"),
            F.max("event_id").alias("last_item"),
        )
    )


@register(
    "q68_region_blocks",
    oracle="""
    WITH blk AS (
        SELECT d.doc_id, t.k AS bidx,
               5 + (d.doc_id * 7 + t.k * 13)
                   % ((160 + (d.doc_id % 3) * 80) - 70) AS x,
               40 + (d.doc_id * 5 + t.k * 11) % 20 AS bw
        FROM documents d, range(0, 3) t(k)
        WHERE d.doc_id % 10 >= 2 AND t.k < 1 + d.doc_id % 3
    )
    SELECT doc_id, 'text' AS region_type, cast(bidx AS BIGINT) AS bidx,
           cast(x AS BIGINT) AS x, cast(bw AS BIGINT) AS width
    FROM blk WHERE bidx % 2 = 0
    """,
    covers=("J3",),
    doc="Region→block index dereference (DocumentLayout.Region."
        "text_block_indices, protos/stream_process.proto:300-312): "
        "explode the region's index array and equi-join it back to the "
        "block table on (doc_id, block_idx) — all native expressions.",
)
def q68_region_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id").filter(
        F.col("doc_id") % 10 >= 2
    )
    nb = (F.col("doc_id") % 3 + 1).cast("int")
    blocks = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), nb - 1)).alias("bidx")
    ).select(
        "doc_id",
        "bidx",
        (
            (F.col("doc_id") * 7 + F.col("bidx") * 13)
            % ((F.col("doc_id") % 3) * 80 + 90) + 5
        ).alias("x"),
        ((F.col("doc_id") * 5 + F.col("bidx") * 11) % 20 + 40).alias("bw"),
    )
    regions = docs.select(
        "doc_id",
        F.lit("text").alias("region_type"),
        F.filter(
            F.sequence(F.lit(0), nb - 1), lambda i: i % 2 == 0
        ).alias("text_block_indices"),
    )
    refs = regions.select(
        "doc_id", "region_type", F.explode("text_block_indices").alias("bidx")
    )
    return refs.join(blocks, ["doc_id", "bidx"]).select(
        "doc_id",
        "region_type",
        F.col("bidx").cast("bigint").alias("bidx"),
        F.col("x").cast("bigint").alias("x"),
        F.col("bw").cast("bigint").alias("width"),
    )


@register(
    "q69_config_broadcast",
    oracle="""
    WITH cfg AS (
        SELECT DISTINCT event_type,
               length(event_type) AS beam,
               CASE WHEN event_type = 'error' THEN 300 ELSE 1000 END AS deadline_ms
        FROM events
    )
    SELECT e.event_type,
           count(*)::BIGINT AS n_events,
           cast(max(c.beam) AS BIGINT) AS beam,
           cast(max(c.deadline_ms) AS BIGINT) AS deadline_ms
    FROM events e JOIN cfg c USING (event_type)
    GROUP BY e.event_type
    """,
    covers=("J4",),
    doc="Per-session config applied to every chunk of the stream "
        "(server.py:74-78,106): a small config dimension broadcast-"
        "joined to the event stream — broadcast(), never a shuffle "
        "join, since config cardinality is tiny at any scale.",
)
def q69_config_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    cfg = ev.select("event_type").distinct().select(
        "event_type",
        F.length("event_type").alias("beam"),
        F.when(F.col("event_type") == "error", 300).otherwise(1000).alias("deadline_ms"),
    )
    return (
        ev.join(F.broadcast(cfg), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("beam").cast("bigint").alias("beam"),
            F.max("deadline_ms").cast("bigint").alias("deadline_ms"),
        )
    )


@register(
    "q70_config_gate",
    oracle="""
    WITH first_cfg AS (
        SELECT user_id, min(ts) AS cfg_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.event_type,
           cast(sum(CASE WHEN f.cfg_ts IS NULL OR e.ts < f.cfg_ts
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
           cast(sum(CASE WHEN f.cfg_ts IS NOT NULL AND e.ts >= f.cfg_ts
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted
    FROM events e LEFT JOIN first_cfg f USING (user_id)
    GROUP BY e.event_type
    """,
    covers=("R7",),
    doc="Validation gate: chunk-before-config → FAILED_PRECONDITION "
        "(server.py:90-94). Batch analog: events before a user's first "
        "'signup' (config) row are rejected; keyed-state analog lives "
        "in the streaming sessionizer.",
)
def q70_config_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    first_cfg = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cfg_ts"))
    )
    joined = ev.join(first_cfg, "user_id", "left")
    rejected = F.col("cfg_ts").isNull() | (F.col("ts") < F.col("cfg_ts"))
    return joined.groupBy("event_type").agg(
        F.sum(F.when(rejected, 1).otherwise(0)).cast("bigint").alias("n_rejected"),
        F.sum(F.when(~rejected, 1).otherwise(0)).cast("bigint").alias("n_accepted"),
    )


@register(
    "q71_salted_agg",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_rows,
           cast(sum(cast(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
               AS sum_fp
    FROM events GROUP BY event_type
    """,
    covers=("A13", "P3-skew"),
    doc="Two-stage salted aggregation over the 5 hot event-type keys "
        "(operators/skew.py): at 100 TB a direct groupBy on a "
        "low-cardinality key funnels each key's full volume to one "
        "reducer; salting spreads it across n_salts partials, then "
        "combines. Result is bit-identical to the direct aggregation "
        "(fixed-point sums are order-independent).",
)
def q71_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.operators.skew import salted_sum_count
    from streamprocess_spark.plans.util import fixed

    ev = load_tables(spark, sf_dir)["events"].select("event_type", "value")
    return salted_sum_count(ev, ["event_type"], fixed("value"))


_PRIO_NAME = {3: "realtime", 2: "high", 1: "normal", 0: "low"}


def _stage_queue_logs(sf_dir: str) -> str:
    """Producer edge (`add_job`, redis_queue.py:92-145): materialize
    the events table as per-priority JSONL logs for the
    `priority_queue` DataSource. Runs on the driver because it IS the
    client side of the queue (the gRPC server's enqueue path), not an
    engine operator; content is deterministic (sorted by event_id) and
    cached by source mtime."""
    import json
    import os
    import tempfile

    import pyarrow.parquet as pq

    from streamprocess_spark.io.queue_source import PRIORITIES
    from streamprocess_spark.io.tables import table_path

    src = table_path(sf_dir, "events")
    key = src.strip("/").replace("/", "_")
    qdir = os.path.join(tempfile.gettempdir(), "spark_graft_queue_cache", key)
    marker = os.path.join(qdir, "_READY")
    if os.path.exists(marker) and os.path.getmtime(marker) >= os.path.getmtime(src):
        return qdir
    tbl = (
        pq.read_table(src, columns=["event_id", "event_type"])
        .to_pandas()
        .sort_values("event_id")
    )
    os.makedirs(qdir, exist_ok=True)
    handles = {p: open(os.path.join(qdir, f"{p}.jsonl"), "w") for p in PRIORITIES}
    try:
        for r in tbl.itertuples():
            pname = _PRIO_NAME[PRIORITY_OF_TYPE.get(r.event_type, 0)]
            handles[pname].write(
                json.dumps(
                    {"job_id": str(r.event_id), "type": r.event_type},
                    sort_keys=True,
                )
                + "\n"
            )
    finally:
        for h in handles.values():
            h.close()
    with open(marker, "w") as f:
        f.write("ok")
    return qdir


@register(
    "q90_queue_source_counts",
    oracle="""
    WITH mapped AS (
        SELECT event_id, event_type,
               CASE event_type
                   WHEN 'error' THEN 'realtime'
                   WHEN 'purchase' THEN 'high'
                   WHEN 'signup' THEN 'normal'
                   ELSE 'low'
               END AS priority
        FROM events
    ), seqs AS (
        SELECT priority, event_type AS type,
               row_number() OVER (PARTITION BY priority
                                  ORDER BY event_id) - 1 AS seq
        FROM mapped
    )
    SELECT priority, type, count(*)::BIGINT AS n_jobs,
           min(seq)::BIGINT AS min_seq, max(seq)::BIGINT AS max_seq
    FROM seqs GROUP BY priority, type
    """,
    covers=("S6", "S7", "R1"),
    doc="The custom priority_queue DataSource under the oracle gate: "
        "events are enqueued (producer edge) into per-priority JSONL "
        "logs, read back via format('priority_queue'), and aggregated. "
        "min/max of the source-assigned per-priority sequence numbers "
        "must match a row_number() reconstruction — i.e. the source's "
        "XRANGE-style ordering and partitioning are themselves "
        "verified, not just the row payloads.",
)
def q90_queue_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.io.queue_source import register_queue_source

    register_queue_source(spark)
    qdir = _stage_queue_logs(sf_dir)
    jobs = spark.read.format("priority_queue").option("path", qdir).load()
    return (
        jobs.groupBy("priority", "type")
        .agg(
            F.count(F.lit(1)).alias("n_jobs"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
    )


# ---------------------------------------------------------------------------
# q155: S8 offset-commit ledger — the stream planner's budgeted
# priority drain replayed against its SQL contract
# ---------------------------------------------------------------------------

# maxOffsetsPerTrigger-analog budget for the replay (the
# max_records_per_batch source option). Fixed, not SF-scaled: the
# contract under test is the allocator, and a fixed budget exercises
# both regimes (batches saturated inside one priority AND batches
# spanning a priority boundary) at every SF.
_LEDGER_BUDGET = 1000


@register(
    "q155_offset_commit_ledger",
    oracle=f"""
    WITH mapped AS (
        SELECT event_id,
               CASE event_type
                   WHEN 'error' THEN 'realtime'
                   WHEN 'purchase' THEN 'high'
                   WHEN 'signup' THEN 'normal'
                   ELSE 'low'
               END AS priority,
               CASE event_type
                   WHEN 'error' THEN 0
                   WHEN 'purchase' THEN 1
                   WHEN 'signup' THEN 2
                   ELSE 3
               END AS prio_rank
        FROM events
    ), seqs AS (
        SELECT priority,
               row_number() OVER (PARTITION BY priority
                                  ORDER BY event_id) - 1 AS seq,
               prio_rank
        FROM mapped
    ), ranked AS (
        SELECT priority, seq,
               row_number() OVER (ORDER BY prio_rank, seq) - 1 AS g
        FROM seqs
    )
    SELECT cast(g // {_LEDGER_BUDGET} AS INT) AS batch_id, priority,
           count(*)::BIGINT AS n_jobs,
           min(seq)::BIGINT AS min_seq,
           max(seq)::BIGINT AS max_seq,
           (max(seq) + 1)::BIGINT AS committed_offset
    FROM ranked GROUP BY 1, 2
    """,
    covers=("S8",),
    doc="S8 ack/offset commit, driver-hashable: the REAL stream "
        "planner (PriorityQueueStreamReader.latestOffset with the "
        "max_records_per_batch backpressure budget) is driven to a "
        "full drain of the staged backlog on the driver — the exact "
        "per-trigger offset dicts Spark's checkpoint would persist "
        "and commit() would ack (the XACK analog, "
        "redis_queue.py:254-276) — and every planned (batch, "
        "priority, start, end) range is joined back against the "
        "source's own rows. The oracle reconstructs the ledger from "
        "the planner's CONTRACT alone: a budgeted priority-descending "
        "drain of a static backlog admits jobs in (prio_rank, seq) "
        "order, so batch_id = global_rank // budget and the committed "
        "offset per advancing priority is its last admitted seq + 1. "
        "Bit-equality proves the planner allocates the budget in "
        "drain order, never re-reads below a committed offset, and "
        "commits exactly the line counts it admitted. The planner "
        "loop is driver-side bounded metadata (~n_jobs/budget rows, "
        "the txlog class); all row data moves through the source's "
        "distributed batch read.",
)
def q155_offset_commit_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.io.queue_source import (
        PRIORITIES,
        PriorityQueueStreamReader,
        register_queue_source,
    )

    register_queue_source(spark)
    qdir = _stage_queue_logs(sf_dir)
    reader = PriorityQueueStreamReader(
        {"path": qdir, "max_records_per_batch": str(_LEDGER_BUDGET)}
    )
    start = reader.initialOffset()
    plan_rows = []
    batch_id = 0
    while True:
        end = reader.latestOffset()
        if end == start:
            break
        # Mirror the engine (and q156): plan the batch's partitions for
        # every (start, end) range. Today latestOffset() already advances
        # the reader's rate-limit cursor so this is a correctness no-op,
        # but it exercises partitions()'s cursor re-anchor path and keeps
        # this replay terminating if latestOffset is ever refactored to
        # be pure (the warc reader's documented style, where only
        # partitions() advances the planner's cursor).
        reader.partitions(start, end)
        for p in PRIORITIES:
            if end[p] > start[p]:
                plan_rows.append((batch_id, p, start[p], end[p]))
        start = end
        batch_id += 1
    planned = spark.createDataFrame(
        plan_rows,
        "batch_id int, prio string, start_seq long, committed_offset long",
    )
    jobs = spark.read.format("priority_queue").option("path", qdir).load()
    return (
        jobs.join(
            F.broadcast(planned),
            (jobs["priority"] == planned["prio"])
            & (jobs["seq"] >= planned["start_seq"])
            & (jobs["seq"] < planned["committed_offset"]),
        )
        .groupBy("batch_id", "priority", "committed_offset")
        .agg(
            F.count(F.lit(1)).alias("n_jobs"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
        .select("batch_id", "priority", "n_jobs", "min_seq", "max_seq",
                "committed_offset")
    )
