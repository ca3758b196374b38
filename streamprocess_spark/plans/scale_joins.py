"""Scale-path join and analytic operators (SURVEY §2.6/§2.9 "free /
exposed by engine" rows, made real and oracle-checked).

The reference has no relational joins (SURVEY §2.9) — these queries
close the §2.9 "range/as-of via inequality conditions" and §2.5/§2.6
"free in Spark" rows with implementations engineered for the 100 TB
path, not just the semantics:

  - as-of join   → single-shuffle union+ignore-nulls-last-value, never
                   a per-key loop or an O(n·m) inequality join;
  - range join   → time-bucketed equi-join with a 2-bucket candidate
                   explode + exact refine, so Catalyst plans a hash
                   join on (key, bucket) instead of a broadcast
                   nested-loop over the inequality;
  - RANGE frames / lead/lag/ntile / grouping sets → native Catalyst
                   window & aggregate operators.

Determinism: all orderings carry a unique tie-break (event_id /
o_orderkey); float sums use the fixed-point pattern (plans/util.py);
interval arithmetic stays in exact integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocess_spark.io.tables import load_tables
from streamprocess_spark.plans.registry import register
from streamprocess_spark.plans.util import SCALE, fixed, ts_sec


@register(
    "q79_asof_join",
    oracle="""
    WITH tagged AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN event_id END AS c_id,
               CASE WHEN event_type = 'click' THEN ts END AS c_ts
        FROM events
        WHERE event_type IN ('click', 'purchase')
    ), carried AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(c_id IGNORE NULLS) OVER w AS last_click_id,
               last_value(c_ts IGNORE NULLS) OVER w AS last_click_ts
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, last_click_id,
           cast(floor((epoch(ts) - epoch(last_click_ts)) * 1000000.0)
                AS BIGINT) AS gap_us
    FROM carried
    WHERE event_type = 'purchase' AND last_click_id IS NOT NULL
    """,
    covers=("J-asof", "§2.9-range/asof", "T11-adjacent"),
    doc="As-of join: each purchase matched to the user's most recent "
        "prior-or-simultaneous click. Spark lacks a native ASOF JOIN; "
        "the scalable composition is union-both-sides + ignore-nulls "
        "last_value over (key ORDER BY ts) — ONE shuffle on the key, "
        "linear in |events|, vs. the naive inequality join's quadratic "
        "blowup. Same plan shape the request↔result correlation (J1, "
        "redis_queue.py:329-344) would use when results must match the "
        "latest preceding request version.",
)
def q79_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("c_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("c_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_id", F.last("c_id", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter(
            (F.col("event_type") == "purchase") & F.col("last_click_id").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "last_click_id",
            F.floor((ts_sec("ts") - ts_sec("last_click_ts")) * F.lit(SCALE))
            .cast("bigint")
            .alias("gap_us"),
        )
    )


_RANGE_BUCKET_US = 600 * 1_000_000  # 10-minute candidate buckets == lookback


@register(
    "q80_range_bucket_join",
    oracle="""
    SELECT e.event_id AS error_id, e.user_id AS user_id,
           count(c.ts)::BIGINT AS n_prior_clicks,
           coalesce(cast(cast(sum(cast(floor(c.value * 1000000.0) AS BIGINT))
                              AS BIGINT) AS double) / 1000000.0,
                    0.0) AS click_value_sum
    FROM (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'error') e
    LEFT JOIN (SELECT user_id, ts, value FROM events
                WHERE event_type = 'click') c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 10 MINUTE
     AND c.ts < e.ts
    GROUP BY e.event_id, e.user_id
    """,
    covers=("J-range", "§2.9-range/asof", "A10-adjacent"),
    doc="Bounded range join: clicks in the 10 minutes before each error, "
        "per user. The oracle states it as an inequality join; the Spark "
        "plan converts it to an EQUI-join by bucketing time into "
        "lookback-sized buckets — each click lands in exactly one "
        "(user, bucket); each error probes its own and the previous "
        "bucket (a window ≤ one bucket wide spans at most 2) — then "
        "refines with the exact interval predicate. At 100 TB this is a "
        "shuffled hash join on (user_id, bucket) with map-side combine "
        "on the aggregate, where the literal inequality join would "
        "degenerate to broadcast-nested-loop.",
)
def q80_range_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    # integer µs bucket — `div` keeps the arithmetic exact (no float div);
    # ntz→ltz cast is an identity under the pinned UTC session zone
    bucket = F.expr(
        f"unix_micros(cast(ts AS timestamp_ltz)) div {_RANGE_BUCKET_US}"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        fixed("value").alias("c_val_fp"),
        bucket.alias("bucket"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("e_ts"),
        bucket.alias("e_bucket"),
    )
    cand = errors.withColumn(
        "bucket", F.explode(F.array(F.col("e_bucket") - 1, F.col("e_bucket")))
    )
    matched = (
        cand.join(
            clicks,
            (F.col("c_user") == F.col("user_id")) & (clicks["bucket"] == cand["bucket"]),
        )
        .filter(
            (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") < F.col("e_ts"))
        )
        .groupBy("error_id")
        .agg(
            F.count(F.lit(1)).alias("n_prior_clicks"),
            (F.sum("c_val_fp").cast("double") / F.lit(SCALE)).alias("click_value_sum"),
        )
    )
    return errors.join(matched, "error_id", "left").select(
        "error_id",
        "user_id",
        F.coalesce("n_prior_clicks", F.lit(0)).cast("bigint").alias("n_prior_clicks"),
        F.coalesce("click_value_sum", F.lit(0.0)).alias("click_value_sum"),
    )


@register(
    "q81_analytic_suite",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number()   OVER wseq AS order_seq,
           coalesce(cast(floor(epoch(o_orderdate)
                       - epoch(lag(o_orderdate)  OVER wseq)) AS BIGINT),
                    -1) AS gap_s_prev,
           coalesce(cast(floor(epoch(lead(o_orderdate) OVER wseq)
                       - epoch(o_orderdate)) AS BIGINT),
                    -1) AS gap_s_next,
           rank()         OVER wspend AS spend_rank,
           dense_rank()   OVER wspend AS spend_dense_rank,
           ntile(4)       OVER wspend AS spend_quartile,
           percent_rank() OVER wspend AS spend_pct
    FROM orders
    WINDOW wseq   AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey),
           wspend AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey)
    """,
    covers=("§2.6-free-analytics", "W3-adjacent"),
    doc="Analytic-function suite the engine exposes beyond the reference "
        "(SURVEY §2.6 'free via pyspark.sql.Window'): lead/lag inter-"
        "order gaps, rank/dense_rank/ntile/percent_rank spend ranking "
        "per customer. Every ordering carries o_orderkey as unique "
        "tie-break; gaps are exact integer seconds (floor of epoch "
        "difference), -1 sentinel instead of NULL at partition edges.",
)
def q81_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wspend = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ep = ts_sec("o_orderdate")
    ep_prev = ts_sec(F.lag("o_orderdate").over(wseq))
    ep_next = ts_sec(F.lead("o_orderdate").over(wseq))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(wseq).alias("order_seq"),
        F.coalesce(F.floor(ep - ep_prev).cast("bigint"), F.lit(-1)).alias(
            "gap_s_prev"
        ),
        F.coalesce(F.floor(ep_next - ep).cast("bigint"), F.lit(-1)).alias(
            "gap_s_next"
        ),
        F.rank().over(wspend).alias("spend_rank"),
        F.dense_rank().over(wspend).alias("spend_dense_rank"),
        F.ntile(4).over(wspend).alias("spend_quartile"),
        F.percent_rank().over(wspend).alias("spend_pct"),
    )


@register(
    "q82_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS prio,
           count(*)::BIGINT AS n_orders,
           cast(sum(cast(floor(o_totalprice * 1000000.0) AS BIGINT))
                AS BIGINT) AS total_fp
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderpriority), ())
    """,
    covers=("A13", "free-grouping-sets"),
    doc="Explicit GROUPING SETS — the irregular subset of the counter "
        "matrix (per (status,prio), per prio, grand total; deliberately "
        "NOT per-status, which CUBE would force). Closes the §2.5 "
        "'distinct/grouping sets/cube/rollup' free-operator row next to "
        "q4 (rollup) and q31 (cube). One shuffle: Catalyst expands the "
        "sets map-side, partial aggregation still applies.",
)
def q82_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
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


_TRAIL_US = 3600 * 1_000_000  # 1-hour trailing frame


@register(
    "q83_trailing_range_sum",
    oracle=f"""
    SELECT event_id, user_id,
           count(*) OVER w AS n_trailing,
           cast(cast(sum(cast(floor(value * 1000000.0) AS BIGINT)) OVER w
                     AS BIGINT) AS double) / 1000000.0 AS trailing_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW)
    """,
    covers=("§2.6-range-frames", "A10", "A12-adjacent"),
    doc="Event-time RANGE frame: per event, the trailing 1-hour count "
        "and fixed-point value sum for the same user — the per-event "
        "form of the arrival-rate window the autoscaler maintains "
        "imperatively (controller.py:401-428). Ordering key is exact "
        "integer µs (unix_micros), so frame membership is identical "
        "across engines; equal-timestamp peers are all included by "
        "RANGE semantics, making ties a non-issue.",
)
def q83_trailing_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp_ltz")))
        .rangeBetween(-_TRAIL_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        (F.sum(fixed("value")).over(w).cast("double") / F.lit(SCALE)).alias(
            "trailing_sum"
        ),
    )


# ---------------------------------------------------------------------------
# q109: Z-order multi-dimensional clustering (100 TB layout op)
# ---------------------------------------------------------------------------

_ZBITS = 8
_ZFILE_SHIFT = 2 * _ZBITS - 4          # top 4 z bits → 16 files


def _z_interleave_sql(a: str, b: str) -> str:
    """Bit-interleaved Morton code as engine-agnostic arithmetic
    (multiplication instead of shifts — identical int64 semantics in
    Spark and DuckDB)."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(({a} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({b} // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


@register(
    "q109_zorder_layout",
    oracle=f"""
    WITH pts AS (
        SELECT user_id % 256 AS a,
               cast(floor(epoch(cast(ts AS timestamp)) / 3600.0) AS BIGINT)
                   % 256 AS b
        FROM events
    ),
    keyed AS (
        SELECT a, b, ({_z_interleave_sql('a', 'b')}) AS z FROM pts
    ),
    zf AS (
        SELECT 'zorder' AS layout, z // {1 << _ZFILE_SHIFT} AS file_id,
               count(*)::BIGINT AS n_rows,
               (max(a) - min(a))::BIGINT AS span_user,
               (max(b) - min(b))::BIGINT AS span_time
        FROM keyed GROUP BY 2
    ),
    lf AS (
        SELECT 'linear' AS layout, b // 16 AS file_id,
               count(*)::BIGINT AS n_rows,
               (max(a) - min(a))::BIGINT AS span_user,
               (max(b) - min(b))::BIGINT AS span_time
        FROM keyed GROUP BY 2
    )
    SELECT * FROM zf UNION ALL SELECT * FROM lf
    """,
    covers=("§2.13-layout", "A13-adjacent"),
    doc="Z-order (Morton) multi-dimensional clustering — the lakehouse "
        "layout op for multi-predicate pruning at 100 TB (Delta/Iceberg "
        "OPTIMIZE ZORDER BY). The z-value is pure integer bit "
        "interleaving (codegen arithmetic, no UDF); file assignment is "
        "the z-key PREFIX — a map-only projection, no global sort "
        "(the write path would repartitionByRange on z). The query "
        "MEASURES why it works: per-file min/max spans under z-order "
        "bound BOTH dimensions (≤3 bits free each → span ≤ 2^6-ish per "
        "dim) while a time-linear layout bounds only time and leaves "
        "user spanning the full 0-255 — exactly the min/max skip-index "
        "statistics a scan would prune on.",
)
def q109_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    pts = ev.select(
        (F.col("user_id") % 256).alias("a"),
        (F.floor(ts_sec("ts") / 3600.0).cast("bigint") % 256).alias("b"),
    )
    z = None
    for i in range(_ZBITS):
        ta = ((F.col("a") / (1 << i)).cast("bigint") % 2) * (1 << (2 * i + 1))
        tb = ((F.col("b") / (1 << i)).cast("bigint") % 2) * (1 << (2 * i))
        z = ta + tb if z is None else z + ta + tb
    keyed = pts.withColumn("z", z)

    def spans(df: DataFrame, layout: str, file_col) -> DataFrame:
        return (
            df.groupBy(file_col.alias("file_id"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.max("a") - F.min("a")).cast("bigint").alias("span_user"),
                (F.max("b") - F.min("b")).cast("bigint").alias("span_time"),
            )
            .select(
                F.lit(layout).alias("layout"), "file_id", "n_rows",
                "span_user", "span_time",
            )
        )

    zf = spans(keyed, "zorder", (F.col("z") / (1 << _ZFILE_SHIFT)).cast("bigint"))
    lf = spans(keyed, "linear", (F.col("b") / 16).cast("bigint"))
    return zf.unionByName(lf)


# ---------------------------------------------------------------------------
# q117: SCD2 history build (warehouse pattern over the event stream)
# ---------------------------------------------------------------------------


@register(
    "q117_scd2_history",
    oracle="""
    WITH changes AS (
        SELECT user_id, event_type AS state, ts, event_id,
               lag(event_type) OVER w AS prev_state
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versions AS (
        SELECT user_id, state, ts AS valid_from, event_id,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM changes
        WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id, state, valid_from, valid_to, event_id,
           (valid_to IS NULL) AS is_current
    FROM versions
    """,
    covers=("W2-adjacent", "J-free"),
    doc="Slowly-changing-dimension type-2 history build — the "
        "warehouse versioning pattern, derived from the event stream "
        "as entity-state changes: change detection via lag() (runs of "
        "equal state collapse), validity intervals via lead() "
        "(valid_from/valid_to half-open, NULL = current). Both "
        "windows share ONE (user_id, ts, event_id) sort — Catalyst "
        "plans a single shuffle+sort reused by both window operators. "
        "The output is exactly what q79's as-of join probes at read "
        "time. Deterministic: event_id breaks ts ties.",
)
def q117_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_state"),
    ).filter(
        F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        "event_id",
    ).select(
        "user_id", "state", "valid_from", "valid_to", "event_id",
        F.col("valid_to").isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# q119: small-file compaction planner (lakehouse maintenance op)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 100  # rows per compacted output file (scaled for test SF)


@register(
    "q119_compaction_plan",
    oracle=f"""
    WITH files AS (
        -- event_date as VARCHAR, not DATE: Spark DateType materializes
        -- in pandas as object-of-datetime.date while DuckDB DATE becomes
        -- datetime64[us]; a format-sensitive value hash renders those
        -- '2024-01-01' vs '2024-01-01 00:00:00'. Both engines cast
        -- date->string identically as yyyy-MM-dd.
        SELECT cast(cast(cast(ts AS timestamp) AS date) AS VARCHAR)
               AS event_date,
               event_type,
               cast(floor(epoch(cast(ts AS timestamp)) / 3600.0) AS BIGINT)
                   AS file_id,
               count(*)::BIGINT AS file_rows
        FROM events
        GROUP BY 1, 2, 3
    ),
    binned AS (
        SELECT event_date, event_type, file_id, file_rows,
               cast(floor(
                   (sum(file_rows) OVER (PARTITION BY event_date, event_type
                                         ORDER BY file_id
                                         ROWS UNBOUNDED PRECEDING)
                    - file_rows) / {_COMPACT_TARGET}.0) AS BIGINT) AS bin
        FROM files
    )
    SELECT event_date, event_type, bin,
           count(*)::BIGINT AS n_files,
           cast(sum(file_rows) AS BIGINT) AS bin_rows,
           cast(min(file_id) AS BIGINT) AS first_file,
           cast(max(file_id) AS BIGINT) AS last_file
    FROM binned
    GROUP BY 1, 2, 3
    HAVING count(*) >= 2
    """,
    covers=("§2.13-layout", "A13-adjacent"),
    doc="Small-file compaction planner — the lakehouse OPTIMIZE "
        "bin-packing step every partitioned streaming ingest needs "
        "(hourly micro-batch files accumulate; scans degrade on file "
        "count, not bytes). File inventory is simulated as one file "
        "per (partition, ingest hour); bins are NEXT-FIT on the "
        "running row count (cumulative-sum window, floor(cum_before / "
        "target)) — the one-pass strategy that needs no iteration, "
        "keeps time-adjacent files together (preserving min/max "
        "pruning locality), and plans each partition independently "
        "(embarrassingly parallel across partitions at 100 TB). "
        "Output: multi-file bins = the actual compaction work list.",
)
def q119_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    files = (
        ev.select(
            F.col("ts").cast("date").cast("string").alias("event_date"),
            "event_type",
            F.floor(ts_sec("ts") / 3600.0).cast("bigint").alias("file_id"),
        )
        .groupBy("event_date", "event_type", "file_id")
        .agg(F.count(F.lit(1)).alias("file_rows"))
    )
    w = (
        Window.partitionBy("event_date", "event_type")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = files.withColumn(
        "bin",
        F.floor(
            (F.sum("file_rows").over(w) - F.col("file_rows"))
            / F.lit(float(_COMPACT_TARGET))
        ).cast("bigint"),
    )
    return (
        binned.groupBy("event_date", "event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("file_rows").cast("bigint").alias("bin_rows"),
            F.min("file_id").cast("bigint").alias("first_file"),
            F.max("file_id").cast("bigint").alias("last_file"),
        )
        .filter(F.col("n_files") >= 2)
    )
