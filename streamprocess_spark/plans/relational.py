"""Relational surface queries (SURVEY §2.5-§2.9, M1).

The reference has no relational engine — these queries exercise the
aggregation/join/sort/set-op surface the Spark rebuild exposes natively
(SURVEY §2.5 "free in Spark" rows, §2.8, §2.9), expressed so Catalyst
gets full pushdown/pruning and AQE freedom.

Scale notes (100 TB):
  - Joins are written fact-to-dim with equi-keys; region/nation always
    broadcast, larger dims rely on autoBroadcastJoinThreshold + AQE
    dynamic join selection. No driver-side collects anywhere.
  - Aggregations are partial-aggregate friendly (sum/count/min/max of
    simple expressions) → map-side combine cuts the shuffle.
  - Top-k = groupBy → orderBy+limit: Spark plans TakeOrderedAndProject,
    which never materializes a full sort at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.plans.registry import register
from streamprocess_spark.plans.util import davg, dsum, sql_davg, sql_dsum


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    covers=("A1", "A4", "A13", "F27-adjacent"),
    doc="TPC-H Q1-shaped pricing summary: scan→filter→multi-agg groupBy. "
        "Flagship batch aggregation (reference analog: per-batch metric "
        "aggregation, stt_worker.py:216-244).",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q2_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    covers=("J-free", "O1", "O4"),
    doc="TPC-H Q3-shaped: 3-way join, filtered, grouped, top-10 by revenue. "
        "Exercises broadcast/sort-merge selection + TakeOrderedAndProject.",
    bench=True,
)
def q2_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    # Aggregate lineitem revenue per orderkey BEFORE the join (guide:
    # aggregate before you shuffle). o_orderdate/o_orderpriority are
    # functionally dependent on the unique o_orderkey, so grouping the
    # filtered lineitem alone is equivalent to the post-join 3-column
    # groupBy — and it both shrinks the lineitem build/broadcast side
    # ~4x (one row per order, not per line item) and deletes the
    # post-join aggregation exchange: the join output feeds
    # TakeOrderedAndProject directly.
    rev = (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(rev, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q3_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           count(*) AS n_items
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN supplier ON s_nationkey = n_nationkey
                JOIN lineitem ON l_suppkey = s_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
    covers=("J-free", "A13"),
    doc="TPC-H Q5-shaped: 6-way star join with broadcast dims. At 100 TB "
        "region/nation/supplier broadcast; orders↔lineitem is the one "
        "real shuffle (AQE handles skew).",
    bench=True,
)
def q3_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # Fact-first join order: lineitem is the probe side of every join, so
    # it is scanned once and never built/broadcast. Written dim-first,
    # Catalyst picked BuildRight on the (dims ⋈ lineitem) join and
    # broadcast the whole fact table — a 6M-row driver collect at the
    # deep leg and unbounded at 100 TB. The r/n/s chain is explicitly
    # broadcast (truly tiny); orders/customer joins carry no hint so the
    # planner stays free to pick SMJ/shuffled-hash at real scale.
    dims = (
        F.broadcast(t["region"].filter(F.col("r_name").isin("ASIA", "EUROPE")))
        .join(F.broadcast(t["nation"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["orders"].filter(
                F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q4_rollup_acctbal",
    oracle=f"""
    SELECT r_name, n_name, count(*) AS n_customers,
           {sql_dsum('c_acctbal', 'total_acctbal')}
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    covers=("A13", "free-rollup"),
    doc="Hierarchical rollup (region→nation→grand total) — the "
        "multi-dim labeled-counter surface (Prometheus labels, "
        "stt_worker.py:21-39) generalized to grouping sets.",
)
def q4_rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        F.broadcast(t["region"])
        .join(F.broadcast(t["nation"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "total_acctbal"))
    )


@register(
    "q5_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    )
    """,
    covers=("J-free",),
    doc="Left-semi join: customers having at least one big order "
        "(request↔result existence check, J1-adjacent).",
)
def q5_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 200000)
    return t["customer"].join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q6_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    )
    """,
    covers=("J-free", "S11-adjacent"),
    doc="Left-anti join: customers with no premium order — the "
        "dead-letter / unmatched-request pattern "
        "(pkg/queue/redis_consumer.go:285-298).",
)
def q6_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    premium = t["orders"].filter(F.col("o_totalprice") > 350000)
    return t["customer"].join(
        premium, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q7_set_ops",
    oracle="""
    SELECT user_id FROM (
        (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase' AND value > 100
         INTERSECT
         SELECT DISTINCT user_id FROM events
          WHERE event_type = 'click' AND value > 100)
        EXCEPT
        SELECT DISTINCT user_id FROM events
         WHERE event_type = 'error' AND value > 400
    ) t
    """,
    covers=("§2.8",),
    doc="Set operations: big-purchasers ∩ big-clickers ∖ hard-error "
        "users (priority-stream union analog, redis_queue.py:157-224).",
)
def q7_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]

    def users(etype: str, minval: float) -> DataFrame:
        return (
            ev.filter((F.col("event_type") == etype) & (F.col("value") > minval))
            .select("user_id")
            .distinct()
        )

    return (
        users("purchase", 100.0)
        .intersect(users("click", 100.0))
        .subtract(users("error", 400.0))
    )


@register(
    "q8_distinct_counts",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    covers=("A5", "free-distinct"),
    doc="Queue-depth / distinct-consumer counts per stream "
        "(redis_queue.py:346-362 analog).",
)
def q8_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q9_argmax",
    oracle="""
    SELECT event_type, event_id AS top_event_id, value AS top_value
    FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id DESC) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
    covers=("O4", "W3"),
    doc="Deterministic arg-max per group (max-contour selection, "
        "image_processor.py:157): row_number with unique tie-break, "
        "never bare max_by on a float.",
)
def q9_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("event_id").alias("top_event_id"),
            F.col("value").alias("top_value"),
        )
    )


@register(
    "q10_substr_truncate",
    oracle="""
    SELECT doc_id, substr(text, 1, 50) AS preview, n_chars
    FROM documents
    WHERE n_chars > 200
    """,
    covers=("O5", "R5"),
    doc="Projection + truncation (transcript preview, "
        "cmd/stt-worker/main.go:117) with a pushed-down filter.",
)
def q10_substr_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.filter(F.col("n_chars") > 200)
        .select("doc_id", F.substring("text", 1, 50).alias("preview"), "n_chars")
    )


@register(
    "q31_cube_order_stats",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS prio,
           count(*)::BIGINT AS n_orders,
           cast(sum(cast(floor(o_totalprice * 1000000.0) AS BIGINT)) AS BIGINT)
               AS total_fp
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    covers=("A13", "free-cube"),
    doc="CUBE over (status, priority) — the multi-dimensional counter "
        "matrix the reference maintains as labeled Prometheus counters "
        "(stt_worker.py:21-39): every label combination plus all "
        "marginal totals in one pass, free in Catalyst.",
)
def q31_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocess_spark.plans.util import fixed

    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(fixed("o_totalprice")).cast("bigint").alias("total_fp"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("prio"),
            "n_orders",
            "total_fp",
        )
    )


@register(
    "q32_time_functions",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_bucket,
           cast(extract(dow FROM min(ts)) AS BIGINT) AS dow,
           cast(extract(minute FROM min(ts)) AS BIGINT) AS first_minute,
           cast(floor(epoch(min(ts))) AS BIGINT) AS first_epoch,
           count(*)::BIGINT AS n_events
    FROM events
    GROUP BY 1
    """,
    covers=("§2.10-builtins", "A5"),
    doc="Date/time built-ins the reference uses imperatively "
        "(time.time() stamps redis_queue.py:115,239, cleanup age math "
        ":382-397): date_trunc bucketing, day-of-week/minute extraction, "
        "epoch seconds — all Catalyst expressions with pushdown-safe "
        "grouping.",
)
def q32_time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_bucket"))
        .agg(
            F.min("ts").alias("first_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "hour_bucket",
            (F.dayofweek("first_ts") - 1).cast("bigint").alias("dow"),
            F.minute("first_ts").cast("bigint").alias("first_minute"),
            F.floor(F.col("first_ts").cast("timestamp_ltz").cast("double"))
                .cast("bigint").alias("first_epoch"),
            "n_events",
        )
    )
