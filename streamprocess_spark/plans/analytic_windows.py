"""Window / analytic / time-bucket queries (SURVEY §2.3 batch analogs,
§2.5 A7-A13, §2.6, M1+M3 substrate).

These are the batch-checkable forms of the streaming semantics: the
same logic runs under Structured Streaming in
``streamprocess_spark.streaming`` and must converge to these results
(tested in tests/test_streaming.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.plans.registry import register
from streamprocess_spark.plans.util import davg, dsum, sql_davg, sql_dsum, ts_sec

SESSION_GAP = "10 minutes"  # scaled analog of the 300 ms VAD gap (config.py:123)


@register(
    "q20_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', cast(ts AS timestamp)) AS window_start,
           event_type,
           count(*) AS n_events,
           {sql_dsum('value', 'total_value')}
    FROM events
    GROUP BY 1, 2
    """,
    covers=("T2", "A5", "W1"),
    doc="Tumbling event-time window (320 ms chunk trigger scaled to "
        "5 min; config.py:121). Streaming twin: stream_tumbling_window.",
    bench=True,
)
def q20_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events",
                "total_value")
    )


@register(
    "q21_sliding_window",
    oracle=f"""
    WITH slid AS (
        SELECT time_bucket(INTERVAL '5 minutes', cast(ts AS timestamp))
                   - to_minutes(5 * k.k) AS window_start,
               value
        FROM events, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT window_start, count(*) AS n_events, {sql_dsum('value', 'total_value')}
    FROM slid
    GROUP BY 1
    """,
    covers=("T3", "W1"),
    doc="Sliding window 10 min / slide 5 min (320/170 ms overlap analog, "
        "config.py:121-122): each event lands in 2 windows.",
)
def q21_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


_ISLANDS_SQL = f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '{SESSION_GAP}'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), islands AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, {sql_dsum('value', 'session_value')}
    FROM islands
    GROUP BY user_id, session_no
"""


@register(
    "q22_session_window",
    oracle=_ISLANDS_SQL,
    covers=("T5", "T4-shape", "W2"),
    doc="Content/gap-defined session windows (VAD silence ≥300 ms endpoint "
        "scaled to 10 min; detect_silence/split_on_silence, "
        "audio_processor.py:280-382) via Spark's native session_window. "
        "Streaming twin: stream_session_window.",
    bench=True,
)
def q22_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "session_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "session_value")
    )


@register(
    "q23_gaps_islands",
    oracle=_ISLANDS_SQL,
    covers=("W2", "T5"),
    doc="Same session semantics built from first principles — lag() change "
        "detection + running-sum island ids (the classic gaps-and-islands "
        "rewrite of detect_silence, audio_processor.py:309-337). Proves the "
        "windowed-SQL path independently of session_window.",
)
def q23_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            ts_sec("ts") - F.lag(ts_sec("ts")).over(order) > 600.0,
            1,
        )
        .when(F.lag("ts").over(order).isNull(), 1)
        .otherwise(0),
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = marked.withColumn("session_no", F.sum("new_session").over(running))
    return islands.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "session_value"),
    ).drop("session_no")


@register(
    "q24_topn_per_key",
    oracle="""
    SELECT user_id, event_id, ts, value
    FROM (
        SELECT user_id, event_id, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) t WHERE rn <= 10
    """,
    covers=("W3", "T9", "A12"),
    doc="Last-N retention per key (transcript ring buffer last-10, "
        "stt_worker.py:516-520; metric history last-100, "
        "controller.py:230-232).",
)
def q24_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("user_id", "event_id", "ts", "value")
    )


@register(
    "q25_ordered_concat",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ' ' ORDER BY ts, event_id) AS journey,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    covers=("A3",),
    doc="Order-sensitive concatenation (transcript assembly ' '.join in "
        "segment order, stt_worker.py:216-236): sort_array(collect_list("
        "struct)) keeps the agg deterministic under parallelism.",
)
def q25_ordered_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            " ",
        ).alias("journey"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q26_latency_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99,
           min(value) AS min_v, max(value) AS max_v
    FROM events
    GROUP BY event_type
    """,
    covers=("A7", "A8", "O3"),
    doc="Latency percentile summary (queue-latency histogram "
        "redis_queue.py:241-244; benchmark p50/p95/p99 "
        "run_benchmarks.py:595-611). Exact interpolated percentile here; "
        "at 100 TB swap to percentile_approx (single-pass sketch).",
)
def q26_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


@register(
    "q27_arrival_rate",
    oracle=f"""
    WITH deltas AS (
        SELECT user_id,
               value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS dv,
               epoch(cast(ts AS timestamp))
                   - epoch(cast(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                AS timestamp)) AS dt
        FROM events
    )
    SELECT user_id,
           count(*) AS n_deltas,
           {sql_dsum('dv', 'total_dv')},
           {sql_davg('dt', 'avg_gap_seconds')}
    FROM deltas WHERE dv IS NOT NULL
    GROUP BY user_id
    """,
    covers=("A10", "A12"),
    doc="Arrival-rate estimation — delta/time-delta via lag() over an "
        "ordered per-key window (queue-depth slope, "
        "controller.py:411-428).",
)
def q27_arrival_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = ev.select(
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
        (ts_sec("ts") - ts_sec(F.lag("ts").over(w))).alias("dt"),
    ).filter(F.col("dv").isNotNull())
    return deltas.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_deltas"),
        dsum("dv", "total_dv"),
        davg("dt", "avg_gap_seconds"),
    )


# Trend slope via explicit least-squares sums (controller.py:346-380 does
# the same numpy math). All sums go through the exact-decimal pattern so
# both engines feed bit-identical operands into the same final formula.
_SLOPE_FINAL = (
    "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)"
)


@register(
    "q28_trend_slope",
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               (epoch(cast(ts AS timestamp)) - 1704067200.0) / 86400.0 AS x,
               value AS y
        FROM events
    ), sums AS (
        SELECT event_type,
               cast(count(*) AS double) AS n,
               cast(cast(sum(cast(floor(x * 1000000.0) AS bigint)) AS bigint) AS double) / 1000000.0 AS sx,
               cast(cast(sum(cast(floor(y * 1000000.0) AS bigint)) AS bigint) AS double) / 1000000.0 AS sy,
               cast(cast(sum(cast(floor(x * y * 1000000.0) AS bigint)) AS bigint) AS double) / 1000000.0 AS sxy,
               cast(cast(sum(cast(floor(x * x * 1000000.0) AS bigint)) AS bigint) AS double) / 1000000.0 AS sxx
        FROM c GROUP BY event_type
    )
    SELECT event_type, round({_SLOPE_FINAL}, 10) AS slope
    FROM sums
    """,
    covers=("A11",),
    doc="Least-squares trend slope of value vs time-in-days per "
        "event_type (arrival-rate linear regression, "
        "controller.py:346-380). Explicit centered sums instead of "
        "regr_slope so the result is bit-deterministic across engines; "
        "x is centered+rescaled to days to keep x² in fixed-point "
        "int64 range.",
)
def q28_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    c = ev.select(
        "event_type",
        ((ts_sec("ts") - F.lit(1704067200.0)) / F.lit(86400.0)).alias("x"),
        F.col("value").alias("y"),
    )
    from streamprocess_spark.plans.util import SCALE, fixed

    sums = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(fixed("x")).cast("double") / SCALE).alias("sx"),
        (F.sum(fixed("y")).cast("double") / SCALE).alias("sy"),
        (F.sum(fixed(F.col("x") * F.col("y"))).cast("double") / SCALE).alias("sxy"),
        (F.sum(fixed(F.col("x") * F.col("x"))).cast("double") / SCALE).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return sums.select("event_type", F.round(slope, 10).alias("slope"))


@register(
    "q29_confidence_clip",
    oracle=f"""
    SELECT event_type,
           {sql_davg('greatest(0.0, least(1.0, 1.0 + (-value / 100.0)))',
                     'avg_confidence')},
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    covers=("A1", "A2", "F27"),
    doc="Mean clipped confidence: avg(clip(1+avg_logprob, 0, 1)) "
        "(src/stt/service.py:152-160) with value/-100 standing in for "
        "the log-prob.",
)
def q29_confidence_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    conf = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), F.lit(1.0) + (-F.col("value") / 100.0))
    )
    return ev.groupBy("event_type").agg(
        davg(conf, "avg_confidence"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q30_rtf_metrics",
    oracle=f"""
    SELECT event_type,
           {sql_davg('value / 100.0', 'avg_rtf')},
           {sql_dsum('value', 'total_processing')},
           count(*) AS n_jobs
    FROM events WHERE value > 1.0
    GROUP BY event_type
    """,
    covers=("A9", "A6"),
    doc="Real-time-factor style ratio metric: processing_time / "
        "audio_duration (stt_worker.py:227-231), with a pushed-down "
        "predicate.",
)
def q30_rtf_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.filter(F.col("value") > 1.0)
        .groupBy("event_type")
        .agg(
            davg(F.col("value") / 100.0, "avg_rtf"),
            dsum("value", "total_processing"),
            F.count(F.lit(1)).alias("n_jobs"),
        )
    )


@register(
    "q84_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END)::BIGINT
               AS n_view,
           count(CASE WHEN t_click > t_view THEN 1 END)::BIGINT
               AS n_view_click,
           count(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)::BIGINT
               AS n_full_funnel
    FROM per_user
    """,
    covers=("free-analytics", "A13-adjacent", "T5-adjacent"),
    doc="Ordered-funnel conversion (view → click → purchase by first-"
        "occurrence time per user): the per-stage conditional min is "
        "one shuffled groupBy with full map-side combine; the stage "
        "comparison is a pure projection; the global count is a "
        "single-row final agg over per-user rows — the standard "
        "billions-of-users funnel plan. NULL stage times fall out of "
        "the count via three-valued logic, identically in both engines.",
)
def q84_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]

    def first_ts(etype: str, alias: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts"))).alias(alias)

    per_user = ev.groupBy("user_id").agg(
        first_ts("view", "t_view"),
        first_ts("click", "t_click"),
        first_ts("purchase", "t_purchase"),
    )
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), F.lit(1))).alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), F.lit(1))).alias(
            "n_view_click"
        ),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                F.lit(1),
            )
        ).alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# q107: pivot (wide metric matrix) — free relational surface
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q107_pivot_matrix",
    oracle="""
    SELECT user_id % 10 AS cohort,
           count(*) FILTER (event_type = 'click')::BIGINT AS click,
           count(*) FILTER (event_type = 'error')::BIGINT AS error,
           count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
           count(*) FILTER (event_type = 'signup')::BIGINT AS signup,
           count(*) FILTER (event_type = 'view')::BIGINT AS view
    FROM events
    GROUP BY cohort
    """,
    covers=("A13-adjacent", "R4-adjacent"),
    doc="Pivoted per-cohort event-type matrix — groupBy().pivot() with "
        "an EXPLICIT value list (the labeled-counter matrix the "
        "reference's Prometheus layer exposes as "
        "jobs_by_type/status_by_priority, metrics.py there). The "
        "explicit pivot values matter at scale: without them Spark "
        "runs a blocking distinct scan over event_type before "
        "planning; with them the pivot compiles to ONE pass of "
        "conditional aggregates (same plan as the oracle's FILTER "
        "clauses) — one keyed shuffle, map-side partials.",
)
def q107_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    out = (
        ev.select((F.col("user_id") % 10).alias("cohort"), "event_type")
        .groupBy("cohort")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    return out.select(
        "cohort",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t)
          for t in _EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# q108: pandas GROUPED_AGG UDAF (§2.12 — completes the UDF/UDAF/UDTF trio)
# ---------------------------------------------------------------------------


@pandas_udf(T.LongType())
def _count_udaf(v: pd.Series) -> int:
    """Group size as a GROUPED_AGG UDAF — Spark disallows mixing
    pandas UDAFs with built-in aggregates in one agg()."""
    return int(len(v))


@pandas_udf(T.DoubleType())
def _energy_udaf(v: pd.Series) -> float:
    """Custom aggregate: fixed-point signal energy sum(v²). Arrow
    GROUPED_AGG — the whole group arrives as one vector. int64
    fixed-point image keeps the fold order-independent (the group's
    row order is NOT guaranteed across shuffles)."""
    ints = np.floor(v.to_numpy(np.float64) ** 2 * 1e6).astype(np.int64)
    return float(ints.sum()) / 1e6


@pandas_udf(T.DoubleType())
def _trimmed_mean_udaf(v: pd.Series) -> float:
    """Custom aggregate: 2-each-end trimmed mean. Sorting the fixed-
    point image makes the trim deterministic under ties (equal values
    drop equal ints — the sum is unaffected by which instance drops)."""
    ints = np.sort(np.floor(v.to_numpy(np.float64) * 1e6).astype(np.int64))
    core = ints[2:-2] if len(ints) > 4 else ints
    return float(core.sum()) / 1e6 / max(len(core), 1)


@register(
    "q108_udaf_energy",
    oracle="""
    WITH f AS (
        SELECT event_type,
               floor(value * value * 1000000.0)::BIGINT AS e6,
               floor(value * 1000000.0)::BIGINT AS v6
        FROM events
    ),
    r AS (
        SELECT event_type, v6,
               row_number() OVER (PARTITION BY event_type ORDER BY v6) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM f
    ),
    core AS (
        SELECT event_type, sum(v6)::BIGINT AS s, count(*)::BIGINT AS c
        FROM r WHERE n <= 4 OR (rn > 2 AND rn <= n - 2)
        GROUP BY event_type
    )
    SELECT f.event_type,
           count(*)::BIGINT AS n_events,
           cast(sum(f.e6) AS DOUBLE) / 1000000.0 AS energy,
           cast(min(core.s) AS DOUBLE) / 1000000.0
               / greatest(min(core.c), 1) AS trimmed_mean
    FROM f JOIN core USING (event_type)
    GROUP BY f.event_type
    """,
    covers=("§2.12-udaf", "A13-adjacent"),
    doc="Custom aggregates via Arrow GROUPED_AGG pandas UDAFs (§2.12 "
        "— the UDAF leg of the UDF/UDAF/UDTF API surface; q18/q55 are "
        "UDTF shapes, F1-F27 scalar UDFs): fixed-point signal energy "
        "and a tie-deterministic trimmed mean per event type. Both "
        "fold int64 fixed-point images so results are independent of "
        "intra-group row order (GROUPED_AGG gives no order "
        "guarantee). Oracle replays the trim via a rank window over "
        "the same int image. Scale: ONE keyed shuffle; each group "
        "lands as a single Arrow vector.",
)
def q108_udaf_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            _count_udaf("value").alias("n_events"),
            _energy_udaf("value").alias("energy"),
            _trimmed_mean_udaf("value").alias("trimmed_mean"),
        )
    )


# ---------------------------------------------------------------------------
# q110: KMV distinct-count sketch (deterministic approximate aggregation)
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_BUCKETS = 16


@register(
    "q110_kmv_distinct",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(cast(user_id AS VARCHAR)), 1, 15))::BIGINT
                   % 1000000007 AS h
        FROM events
    ),
    local_k AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type, h % {_KMV_BUCKETS}
                                      ORDER BY h) AS rn
            FROM hashed
        ) WHERE rn <= {_KMV_K}
    ),
    global_k AS (
        SELECT event_type, h, rn FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM local_k
        ) WHERE rn <= {_KMV_K}
    ),
    kth AS (
        SELECT event_type, max(h)::BIGINT AS h_k, count(*)::BIGINT AS k_got
        FROM global_k GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT k.event_type, k.h_k, k.k_got, e.exact_distinct,
           round(({_KMV_K} - 1.0) * 1000000007.0 / k.h_k, 4) AS est_distinct
    FROM kth k JOIN exact e USING (event_type)
    """,
    covers=("A5-adjacent", "free-approx-distinct"),
    doc="KMV (k-minimum-values) distinct-count sketch, deterministic "
        "across engines — unlike HLL/approx_count_distinct, whose "
        "register layouts differ per engine, the KMV synopsis is a "
        "pure function of the md5 hash stream, so Spark and DuckDB "
        "agree bit-for-bit on the sketch AND the estimate "
        "(Bar-Yossef et al. 2002; est = (k-1)/x_(k)). Scale shape: "
        "dedup → TWO-LEVEL k-min (per (group, hash-bucket) "
        "row_number, then per group over ≤ buckets·k survivors) — "
        "the full group's distinct stream never sorts on one task, "
        "the same discipline as the similarity top-k. The sketch is "
        "mergeable (union = re-min), the property that matters for "
        "100 TB partial aggregation.",
)
def q110_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.operators.dedup import MOD, token_hash

    ev = load_tables(spark, sf_dir)["events"]
    hashed = (
        ev.select(
            "event_type", token_hash(F.col("user_id").cast("string")).alias("h")
        )
        .dropDuplicates(["event_type", "h"])
    )
    w_local = Window.partitionBy("event_type", F.col("h") % _KMV_BUCKETS).orderBy("h")
    local_k = (
        hashed.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn")
    )
    w_global = Window.partitionBy("event_type").orderBy("h")
    global_k = (
        local_k.withColumn("rn", F.row_number().over(w_global))
        .filter(F.col("rn") <= _KMV_K)
    )
    kth = global_k.groupBy("event_type").agg(
        F.max("h").cast("bigint").alias("h_k"),
        F.count(F.lit(1)).cast("bigint").alias("k_got"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    est = F.round(
        F.lit(float(_KMV_K) - 1.0) * F.lit(float(MOD)) / F.col("h_k"), 4
    )
    return (
        kth.join(exact, "event_type")
        .select("event_type", "h_k", "k_got", "exact_distinct",
                est.alias("est_distinct"))
    )
