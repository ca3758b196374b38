#!/usr/bin/env python
"""Per-stage profile of q149_semdedup_scale's operator (round-12
verdict #4: "profile the decade, don't guess").

Splits semdedup_scaled into its timed stages under the bench's noop
protocol, at the SOAK deployment configuration (auto bits, k=8,
n_iter=2) on the x100 / x1000 soak dirs:

  coded         one corpus pass: parquet scan + coarse-code pandas UDF
  init          grouped k-means init (window rank over the corpus) +
                eager centroid checkpoint
  lloyd_1/2     one Lloyd turn each: broadcast assign (score UDF) +
                (coarse,bucket) update agg + eager centroid checkpoint
  final_assign  the final assignment pass alone (noop sink)
  pair_stats    applyInPandas block scorer branch (recomputes the
                final assignment inside its own lineage)
  members_join  the registered query end-to-end (members agg + left
                join on top of the same subtrees)

Because every stage below `init` re-derives its inputs lazily, the
DELTAS between stages attribute the repeated-subtree cost: e.g.
pair_stats - final_assign is the shuffle+scorer increment, and
members_join - pair_stats is what the members branch re-executes.

Usage: python scripts/q149_profile.py [x100] [x1000]
Prints one JSON line per data dir: {dir, n, bits, stages: {...}}.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from streamprocess_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def profile(spark, d: str) -> dict:
    import duckdb

    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators import similarity as S
    from pyspark.sql import functions as F, Window

    n = duckdb.sql(
        f"SELECT count(*) FROM '{os.path.join(d, 'embeddings.parquet')}'"
    ).fetchone()[0]
    bits = max(1, round(math.log2(max(2.0, n / 2000.0))))
    k, n_iter, dim, threshold = 8, 2, 64, 0.35
    emb = load_tables(spark, d)["embeddings"]
    stages: dict[str, float] = {}
    sc = spark.sparkContext

    def timed(label: str, fn):
        sc.setJobDescription(f"q149 profile: {label}")
        t0 = time.perf_counter()
        out = fn()
        stages[label] = round(time.perf_counter() - t0, 2)
        sc.setJobDescription(None)
        print(f"# {d}: {label} {stages[label]}s", file=sys.stderr)
        return out

    # -- mirrors semdedup_scaled/kmeans_fit_grouped internals (profile
    #    only; the operator itself is the source of truth)
    v = S.coarse_codes(emb, bits, dim=dim)
    timed("coded", lambda: _noop(v))

    w0 = Window.partitionBy("coarse").orderBy("vec_id")
    init = (
        v.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") <= k)
        .select(
            "coarse",
            (F.col("rn") - 1).cast("bigint").alias("cent_id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
            .alias("cent"),
        )
    )
    cents = timed("init", lambda: S._materialize_centroids(init))

    for it in range(n_iter):
        def turn(cents=cents):
            assigned = S._kmeans_assign_grouped(v, cents)
            sums = assigned.groupBy("coarse", "bucket").agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(
                        F.floor(
                            F.col("embedding")[i].cast("double")
                            * F.lit(S.MEAN_SCALE)
                        ).cast("bigint")
                    ).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            new = sums.select(
                "coarse",
                F.col("bucket").alias("cent_id"),
                F.array(
                    *[
                        F.col(f"s{i}").cast("double")
                        / (F.lit(S.MEAN_SCALE) * F.col("cnt").cast("double"))
                        for i in range(dim)
                    ]
                ).alias("cent_new"),
            )
            return S._materialize_centroids(
                cents.join(new, ["coarse", "cent_id"], "left").select(
                    "coarse",
                    "cent_id",
                    F.coalesce(F.col("cent_new"), F.col("cent")).alias(
                        "cent"
                    ),
                )
            )
        cents = timed(f"lloyd_{it + 1}", turn)

    assigned = S._kmeans_assign_grouped(v, cents)
    a = assigned.select("coarse", "vec_id", "embedding", "bucket", "s")
    timed("final_assign", lambda: _noop(a))
    timed(
        "pair_stats",
        lambda: _noop(S._cluster_pair_stats(a, ["coarse", "bucket"],
                                            threshold)),
    )
    timed(
        "members_join",
        lambda: _noop(
            S.semdedup_scaled(emb, bits=bits, k=k, n_iter=n_iter, dim=dim,
                              threshold=threshold)
        ),
    )
    return {"dir": d, "n": n, "bits": bits, "stages": stages,
            "total_endtoend": stages["members_join"]}


def main(legs: list[str]) -> None:
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for leg in legs:
        factor = int(leg.lstrip("x"))
        d = bench.ensure_soak_dir(sf_dir, factor=factor)
        print(json.dumps(profile(spark, d)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or ["x100", "x1000"])
