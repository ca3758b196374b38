#!/usr/bin/env python
"""Cold-JVM A/B runner (round-12 verdict #2 and #5).

One invocation = one FRESH JVM measuring ONE query form at one data
dir, under the driver bench's protocol shape: warm the JVM on q1's
noop write (uncounted), then two interleaved passes [target, spacer]
with the min standing. Alternate invocations across forms to bracket
host weather:

  for i in 1 2 3; do
    python scripts/cold_ab.py q45_merge --dir /root/testdata/sf0.1
    python scripts/cold_ab.py q45_auto  --dir /root/testdata/sf0.1
  done

Forms:
  q45_merge : registered minhash_candidates (MERGE-hinted self-join)
  q45_auto  : round-11 form (no hint; planner free to broadcast)
  q2_preagg : registered q2 (revenue pre-aggregated below the join)
  q2_old    : round-11 form (post-join 3-key groupBy)
  q2_semi   : pre-agg + broadcast semi-join pushdown of order keys
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def q45_merge(spark, d):
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators import dedup as D

    docs = load_tables(spark, d)["documents"]
    return D.minhash_candidates(docs, "doc_id", "text")


def q45_auto(spark, d):
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators import dedup as D

    docs = load_tables(spark, d)["documents"]
    bands = D.minhash_bands(D.minhash_signatures(docs, "doc_id", "text"))
    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def q2_preagg(spark, d):
    from streamprocess_spark.plans import QUERIES
    from streamprocess_spark.plans.registry import _ensure_loaded

    _ensure_loaded()
    return QUERIES["q2_shipping_priority"].builder(spark, d)


def q2_old(spark, d):
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.plans.util import dsum

    t = load_tables(spark, d)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q2_semi(spark, d):
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.plans.util import dsum

    t = load_tables(spark, d)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    co = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
    )
    keys = co.select(F.col("o_orderkey").alias("k"))
    rev = (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(F.broadcast(keys), F.col("l_orderkey") == F.col("k"),
              "left_semi")
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
    )
    return (
        co.join(rev, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q45_shash(spark, d):
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators import dedup as D

    docs = load_tables(spark, d)["documents"]
    bands = D.minhash_bands(D.minhash_signatures(docs, "doc_id", "text"))
    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        left.join(right.hint("shuffle_hash"), ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def q2_semi_auto(spark, d):
    """q2_semi without the broadcast hint (planner-chosen semi join)."""
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.plans.util import dsum

    t = load_tables(spark, d)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    co = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
    )
    keys = co.select(F.col("o_orderkey").alias("k"))
    rev = (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(keys, F.col("l_orderkey") == F.col("k"), "left_semi")
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
    )
    return (
        co.join(rev, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


FORMS = {
    "q45_merge": q45_merge,
    "q45_shash": q45_shash,
    "q45_auto": q45_auto,
    "q2_preagg": q2_preagg,
    "q2_old": q2_old,
    "q2_semi": q2_semi,
    "q2_semi_auto": q2_semi_auto,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("form", choices=sorted(FORMS))
    ap.add_argument("--dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from streamprocess_spark import get_spark
    from streamprocess_spark.plans import QUERIES
    from streamprocess_spark.plans.registry import _ensure_loaded

    _ensure_loaded()
    spark = get_spark(app_name=f"cold-ab-{args.form}")
    spark.sparkContext.setLogLevel("ERROR")

    def run_full(df):
        df.write.format("noop").mode("overwrite").save()

    # warm like bench.py: first bench query, uncounted
    run_full(QUERIES["q1_pricing_summary"].builder(spark, args.dir))

    best = float("inf")
    reads = []
    for _ in range(args.passes):
        t0 = time.perf_counter()
        run_full(FORMS[args.form](spark, args.dir))
        el = time.perf_counter() - t0
        reads.append(round(el, 4))
        best = min(best, el)
        # spacer (the headline loop runs other queries between passes)
        run_full(QUERIES["q1_pricing_summary"].builder(spark, args.dir))
    print(json.dumps({"form": args.form, "dir": args.dir,
                      "best": round(best, 4), "reads": reads}))
    spark.stop()


if __name__ == "__main__":
    main()
