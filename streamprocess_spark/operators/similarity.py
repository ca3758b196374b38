"""Similarity search over embedding columns (SURVEY §2.13).

Brute-force cosine top-k is the exactness baseline: broadcast the
(small) query set against the corpus, compute dot products JVM-side
with zip_with/aggregate (whole-stage codegen, no Python), rank per
query. At 100 TB the corpus side stays partitioned and is read once;
per-partition top-k then a tiny global rank — no all-pairs shuffle.

Dot products accumulate in fixed point (floor(x·y·1e12) as int64) so
results are exact and order-independent → bit-identical to the DuckDB
oracle (see plans.util for why double and decimal sums both fail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DOT_SCALE = 1e12


def _dot(a, b):
    prods = F.zip_with(
        a, b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(DOT_SCALE))
        .cast("bigint"),
    )
    return (
        F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
        .cast("double") / F.lit(DOT_SCALE)
    )


def _self_dot(a):
    return _dot(a, a)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("nrm", F.sqrt(_self_dot(F.col(vec_col))))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (similarity rounded to 6 dp; ties broken by corpus id)."""
    q = with_norm(
        queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("qe")
        ),
        "qe",
    ).withColumnRenamed("nrm", "qnrm")
    c = with_norm(
        emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("ce")), "ce"
    ).withColumnRenamed("nrm", "cnrm")
    pairs = c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
    scored = pairs.withColumn(
        "cos_sim",
        F.round(_dot(F.col("qe"), F.col("ce")) / (F.col("qnrm") * F.col("cnrm")), 6),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank", "cos_sim")
    )


def lsh_bucket(
    emb: DataFrame,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Sign-random-projection LSH bucket id per vector. Hyperplane
    components are derived from md5 (deterministic, engine-agnostic):
    r[p][j] = (H(f"{p}:{j}") % 2001 - 1000) / 1000.0 — the scale path
    for ANN: candidates are searched only within a bucket."""
    from streamprocess_spark.operators.dedup import MOD  # noqa: F401

    def plane_component(p: int, j: int) -> float:
        import hashlib

        h = int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:15], 16) % MOD
        return ((h % 2001) - 1000) / 1000.0

    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = F.array(*[F.lit(plane_component(p, j)) for j in range(dim)])
        d = _dot(F.col(vec_col), plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(0).cast("bigint")
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        bucket.alias("bucket"),
    )


def ann_topk_lsh(
    emb: DataFrame, queries: DataFrame, k: int = 5, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.
    Trades recall for a corpus-partition-local search; the bucket join
    is an equi-join on the bucket id (shuffle by bucket, no crossJoin)."""
    qb = lsh_bucket(queries, n_planes, dim=dim).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), "bucket"
    )
    cb = lsh_bucket(emb, n_planes, dim=dim).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"), "bucket"
    )
    pairs = cb.join(F.broadcast(qb), "bucket").filter(F.col("cid") != F.col("qid"))
    qn = F.sqrt(_self_dot(F.col("qe")))
    cn = F.sqrt(_self_dot(F.col("ce")))
    scored = pairs.withColumn(
        "cos_sim", F.round(_dot(F.col("qe"), F.col("ce")) / (qn * cn), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank", "cos_sim")
    )
