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

from typing import Iterator  # noqa: F401 — resolves pandas_udf type hints

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

DOT_SCALE = 1e12
DIM = 64  # embedding dimensionality of the corpus tables


def _dot(a, b):
    """zip_with/aggregate fixed-point dot — the ONE per-row dot form,
    after a measured round-8 A/B history worth keeping:

    Spark HOFs are CodegenFallback (every element eval is an
    interpreted lambda binding), so unrolled 64-term expressions were
    tried at every flat one-dot-per-row site. They LOST everywhere
    once nearest-centroid assignment moved to the Arrow scorer
    (_score_udf): q48 exact top-k regressed 1.1s -> 4.5s with the
    unrolled dot (plan-build + codegen cost dwarfs eval for a
    broadcast-probe-sized score set), and the semdedup pair site was
    ~10% SLOWER at the soak x100 corpus (34.5/23.7s unrolled vs
    31.4/21.2s HOF). Late round 8 the pair site left Catalyst
    entirely for the _cluster_pair_stats Arrow block scorer (the honest
    noop-write timing showed the per-pair HOF was the q149 soak
    bottleneck: 337-438s -> 47s at x100, bit-identical). Unrolling
    k-candidate argmax expressions was also measured and worse:
    janino's 64 KB method limit overflows (silent whole-stage
    interpreted fallback) and deep unrolled chains make optimizer
    constraint substitution exponential. The true per-row hot loops
    (centroid assignment, coarse codes) live in Arrow-vectorized
    scorers; everything that stays in Catalyst uses this HOF form,
    which keeps analysis cheap. `_dot_fp_unrolled` survives solely
    for the PQ ADC table build, which needs the undivided bigint form
    over a <=n_queries*m*ksub-row frame.

    Per-term arithmetic everywhere (HOF, unrolled, Arrow scorer):
    floor(x*y*1e12) as int64, order-independent integer sum — so
    results are bit-identical across forms and to the DuckDB
    oracles."""
    prods = F.zip_with(
        a, b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(DOT_SCALE))
        .cast("bigint"),
    )
    return (
        F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
        .cast("double") / F.lit(DOT_SCALE)
    )


def _dot_fp_unrolled(a, b, dim: int = DIM):
    """Unrolled fixed-point dot WITHOUT the final division (bigint).
    Sole remaining use: the PQ ADC table build (see _dot)."""
    out = None
    for i in range(dim):
        t = F.floor(
            a[i].cast("double") * b[i].cast("double") * F.lit(DOT_SCALE)
        ).cast("bigint")
        out = t if out is None else out + t
    return out


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
    n_buckets: int = 32,
    collected_queries: bool = False,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (similarity rounded to 6 dp; ties broken by corpus id).

    Scale shape (the part that matters at 100 TB):
      - queries are broadcast; scoring is a map-only pass over corpus
        partitions (zip_with/aggregate, whole-stage codegen, no
        Python);
      - scores are projected to (qid, cid, cos_sim) BEFORE any
        shuffle — the embedding arrays never move;
      - ranking is two-level: row_number per (qid, hash(cid) bucket)
        keeps k rows per bucket, then a global rank over the
        nq·n_buckets·k survivors. A single window per qid would send
        a query's ENTIRE corpus scores to one reducer — the straggler/
        OOM path. Per-bucket top-k under the same (cos_sim desc, cid)
        ordering is a superset of the global top-k, so results are
        identical.

    collected_queries=True routes the scoring loop through the Arrow
    block scorer instead of the broadcast-NLJ + per-pair HOF dot
    (round-12: q48 measured 1.37→0.96 s sf0.1 / bit-identical output;
    the nq·dim interpreted lambda evals per corpus row become two
    numpy ops per Arrow batch). It COLLECTS the query set — bounded-
    metadata class, same as _collect_centroids — so it is only legal
    when the caller guarantees a small fixed query set (q48's 10
    probe vectors). Callers whose "queries" side scales with the
    corpus (q72's self-join) must keep the default broadcast path."""
    if collected_queries:
        return _cosine_topk_collected(
            emb, queries, k, vec_col, id_col, n_buckets
        )
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
    scored = pairs.select(
        "qid",
        "cid",
        F.round(
            _dot(F.col("qe"), F.col("ce")) / (F.col("qnrm") * F.col("cnrm")), 6
        ).alias("cos_sim"),
    )
    return _bucketed_rank(scored, k, n_buckets)


def _bucketed_rank(scored: DataFrame, k: int, n_buckets: int) -> DataFrame:
    """Two-level top-k over (qid, cid, cos_sim): per-(qid, cid-hash
    bucket) row_number keeps k rows per bucket, then a global rank —
    identical results to a single window, without the one-reducer-per-
    query straggler (see cosine_topk docstring)."""
    w_local = Window.partitionBy(
        "qid", F.pmod(F.hash("cid"), F.lit(n_buckets))
    ).orderBy(F.desc("cos_sim"), F.asc("cid"))
    cand = (
        scored.withColumn("r1", F.row_number().over(w_local))
        .filter(F.col("r1") <= k)
        .drop("r1")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank", "cos_sim")
    )


def _cosine_topk_collected(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """Arrow-block scoring arm of cosine_topk (collected_queries=True).

    The query matrix is collected (bounded by contract) and closed
    over; each Arrow batch of corpus vectors produces exact fixed-
    point self-dots and per-query dots (floor(x·y·1e12) int64 — the
    identical per-term arithmetic of _dot, so results are bit-equal).
    Only integers cross the Python boundary; rounding and the ranking
    stay in Catalyst. ReadSchema stays (vec_id, embedding); no join
    appears in the plan at all."""
    import math

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    qrows = sorted(
        queries.select(id_col, vec_col).collect(), key=lambda r: r[0]
    )
    qids = [int(r[0]) for r in qrows]
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qnrm = [
        math.sqrt(
            float(np.floor(qv * qv * DOT_SCALE).astype(np.int64).sum())
            / DOT_SCALE
        )
        for qv in qm
    ]

    @pandas_udf("struct<cnfp:bigint,dots:array<bigint>>")
    def _score(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            e = np.asarray(np.stack(s.to_numpy()), dtype=np.float64)
            cn = np.floor(e * e * DOT_SCALE).astype(np.int64).sum(1)
            d = np.stack(
                [
                    np.floor(e * qv * DOT_SCALE).astype(np.int64).sum(1)
                    for qv in qm
                ],
                axis=1,
            )
            yield pd.DataFrame({"cnfp": cn, "dots": list(d)})

    qid_arr = F.array(*[F.lit(x) for x in qids])
    qnrm_arr = F.array(*[F.lit(x) for x in qnrm])
    scored = (
        emb.select(
            F.col(id_col).alias("cid"), _score(F.col(vec_col)).alias("s")
        )
        .select(
            "cid",
            F.sqrt(F.col("s.cnfp").cast("double") / F.lit(DOT_SCALE)).alias(
                "cnrm"
            ),
            F.posexplode("s.dots").alias("qidx", "dfp"),
        )
        .select(
            "cid",
            "cnrm",
            qid_arr[F.col("qidx")].alias("qid"),
            qnrm_arr[F.col("qidx")].alias("qnrm"),
            "dfp",
        )
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            F.round(
                (F.col("dfp").cast("double") / F.lit(DOT_SCALE))
                / (F.col("qnrm") * F.col("cnrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    return _bucketed_rank(scored, k, n_buckets)


def _plane_component(table: int, p: int, j: int) -> float:
    """md5-seeded hyperplane component (deterministic, engine-agnostic):
    (H(f"{table}:{p}:{j}") % 2001 - 1000) / 1000.0."""
    import hashlib

    from streamprocess_spark.operators.dedup import MOD

    h = int(hashlib.md5(f"{table}:{p}:{j}".encode()).hexdigest()[:15], 16) % MOD
    return ((h % 2001) - 1000) / 1000.0


def lsh_buckets(
    emb: DataFrame,
    n_tables: int = 8,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Multi-table sign-random-projection LSH: one row per
    (vector, table) with that table's bucket id. Single-table sign-LSH
    needs ALL planes to agree, so recall collapses as planes grow; the
    standard fix is L independent tables of m planes — candidates are
    the union over tables (amplification: 1-(1-p^m)^L). The exploded
    index is L× the corpus — exactly how production LSH indexes trade
    space for recall."""
    tables = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("bigint")
        for p in range(n_planes):
            plane = F.array(
                *[F.lit(_plane_component(t, p, j)) for j in range(dim)]
            )
            bucket = bucket + F.when(_dot(F.col(vec_col), plane) > 0,
                                     F.lit(1 << p)).otherwise(0).cast("bigint")
        tables.append(
            F.struct(F.lit(t).alias("tbl"), bucket.alias("bucket"))
        )
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.explode(F.array(*tables)).alias("tb"),
    ).select("vec_id", "embedding", "tb.tbl", "tb.bucket")


def _exact_rescore_topk(pairs: DataFrame, k: int) -> DataFrame:
    """Exact cosine rescoring + final rank over a candidate pair set
    carrying (qid, qe, cid, ce)."""
    qn = F.sqrt(_self_dot(F.col("qe")))
    cn = F.sqrt(_self_dot(F.col("ce")))
    scored = pairs.select(
        "qid",
        "cid",
        F.round(_dot(F.col("qe"), F.col("ce")) / (qn * cn), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank", "cos_sim")
    )


_SCORE_T = "struct<vnfp:bigint,dots:array<bigint>,cnfps:array<bigint>>"


def _collect_centroids(cents: DataFrame, grouped: bool):
    """Collect the centroid table to the driver — BOUNDED metadata (k,
    or 2^bits*k <= ~1024 rows; the same class as the txlog's per-file
    stats), already materialized by _materialize_centroids. Returns
    {group: (ids, C, cnfps)} with C a float64 matrix and cnfps the
    exact fixed-point self-dots, ordered by cent_id."""
    import numpy as np

    out = {}
    for r in cents.collect():
        g = r["coarse"] if grouped else 0
        out.setdefault(g, []).append((int(r["cent_id"]), r["cent"]))
    packed = {}
    for g, rows in out.items():
        rows.sort()
        ids = [cid for cid, _ in rows]
        C = np.array([c for _, c in rows], dtype=np.float64)
        cnfps = (
            np.floor(C * C * DOT_SCALE).astype(np.int64).sum(axis=1)
        )
        packed[g] = (ids, C, cnfps)
    return packed


def _score_udf(packed, grouped: bool):
    """Arrow-vectorized centroid scorer: for each row, the EXACT
    fixed-point dot of the embedding against every centroid of its
    group, plus the embedding's own fixed-point self-dot. Every output
    is an int64 produced by floor(x*y*1e12) products and integer sums
    — IEEE float64 multiplies are bit-identical between numpy and the
    JVM, so these integers equal what the JVM expressions computed,
    and ALL value-shaping (the /1e12 casts, sqrt, round-6, argmax
    tie-breaks) stays in Spark expressions with unchanged semantics.

    Why a pandas UDF at all: this is the measured hot loop of the
    whole k-means/ANN family. Spark HOF dots are interpreted
    (~0.25 ms/row); every Catalyst unrolled-codegen variant either
    overflows janino's 64 KB method limit (falling back to interpreted
    for the whole stage) or bloats plan-build by seconds per query.
    The numpy batch matmul shape does the same arithmetic at memory
    bandwidth, and the centroids ride in the closure so assignment is
    a pure MAP stage — no join, no broadcast, no shuffle.

    (Round 13 measured and REJECTED batch-local replica factoring here
    — np.unique each batch / per-group subset, score distinct vectors
    once, scatter by inverse. Replicas cluster by VALUE in the
    downstream pair scorer, where the factoring won 75x, but they have
    no file-order locality, so Arrow batches carry few duplicates and
    the extra sorts made the x1000 Lloyd turn 8.5 s -> 40.6 s. See
    OPTIMIZATION_r13.md.)"""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def _score_block(E, ids_C_cn):
        _, C, cnfps = ids_C_cn
        dots = (
            np.floor(E[:, None, :] * C[None, :, :] * DOT_SCALE)
            .astype(np.int64)
            .sum(axis=2)
        )
        return dots, cnfps

    if grouped:

        @pandas_udf(_SCORE_T)
        def score(emb: pd.Series, coarse: pd.Series) -> pd.DataFrame:
            E = np.array(emb.tolist(), dtype=np.float64)
            g = coarse.to_numpy()
            vnfp = np.floor(E * E * DOT_SCALE).astype(np.int64).sum(axis=1)
            dots_col = [None] * len(g)
            cn_col = [None] * len(g)
            for gv in np.unique(g):
                m = np.nonzero(g == gv)[0]
                blk = packed.get(int(gv))
                if blk is None:
                    # group without centroids: emit empty score arrays
                    # so every candidate is NULL and the caller drops
                    # the row — the previous equi-join's drop
                    # semantics, not an executor KeyError crash
                    for j in m:
                        dots_col[j] = []
                        cn_col[j] = []
                    continue
                dots, cnfps = _score_block(E[m], blk)
                for j, row in zip(m, dots):
                    dots_col[j] = row
                    cn_col[j] = cnfps
            return pd.DataFrame(
                {"vnfp": vnfp, "dots": dots_col, "cnfps": cn_col}
            )

    else:
        ids_C_cn = packed[0]

        @pandas_udf(_SCORE_T)
        def score(emb: pd.Series) -> pd.DataFrame:
            E = np.array(emb.tolist(), dtype=np.float64)
            vnfp = np.floor(E * E * DOT_SCALE).astype(np.int64).sum(axis=1)
            dots, cnfps = _score_block(E, ids_C_cn)
            return pd.DataFrame(
                {
                    "vnfp": vnfp,
                    "dots": list(dots),
                    "cnfps": [cnfps] * len(vnfp),
                }
            )

    return score


def _best_from_scores(sc, ids, k: int, probe: int = 1):
    """probe best struct(s, negid) from a _SCORE_T column: s_i =
    round((dots[i]/1e12) / (vn * cn_i), 6) — the EXACT expression
    shape (and hence values, rounding, tie-breaks) of the previous
    join-based scorer, but over k scalar array lookups, so every
    expression is tiny and codegen-clean. ids supplies the centroid
    ids (grouped groups share ids 0..k-1 by construction; greatest()
    ignores the NULL candidates of groups holding fewer than k
    centroids)."""
    vn = F.sqrt(sc["vnfp"].cast("double") / F.lit(DOT_SCALE))
    cands = []
    for i in range(k):
        cn = F.sqrt(sc["cnfps"][i].cast("double") / F.lit(DOT_SCALE))
        s_i = F.round(
            (sc["dots"][i].cast("double") / F.lit(DOT_SCALE)) / (vn * cn), 6
        )
        cands.append(
            F.when(
                F.size(sc["dots"]) > i,
                F.struct(s_i.alias("s"), F.lit(-ids[i]).alias("negid")),
            )
        )
    # iterative masking: round r's best is removed (negid is unique, so
    # struct equality masks exactly one candidate) and the next
    # greatest() is pick r+1 — honors any probe, where the first cut of
    # this expression silently truncated probe >= 3 to two picks. Picks
    # beyond a row's available centroids come out NULL (callers
    # array_compact / filter them), matching the old row_number form.
    out = []
    cur = cands
    for _ in range(min(probe, k)):
        best = cur[0] if k == 1 else F.greatest(*cur)
        out.append(best)
        cur = [
            F.when(c == best, F.lit(None).cast("struct<s:double,negid:bigint>"))
            .otherwise(c)
            for c in cur
        ]
    return out


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its `probe`
    nearest centroids by cosine (round 6, centroid-id tie-break).
    Returns (vec_id, embedding, bucket) — one row per probe. The
    packed centroid row is broadcast and the top-probe selection is a
    map-side array slice — genuinely zero shuffle (the previous form
    expanded k rows per vector and ranked them through a per-vector
    window, i.e. a full-corpus shuffle per assignment)."""
    c = centroids.select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent")
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    packed = _collect_centroids(c, grouped=False)
    ids, _, _ = packed[0]
    scored = v.withColumn(
        "_sc", _score_udf(packed, grouped=False)(F.col("embedding"))
    )
    picks = _best_from_scores(F.col("_sc"), ids, len(ids), probe)
    return (
        scored.select(
            "vec_id",
            "embedding",
            F.explode(F.array_compact(F.array(*picks))).alias("bk"),
        )
        .select("vec_id", "embedding", (-F.col("bk.negid")).alias("bucket"))
    )


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors live in the inverted
    list of their nearest centroid; queries probe their `probe`
    nearest lists and rescore exactly inside them. Centroids are a
    deterministic corpus sample (id < n_centroids) standing in for a
    trained coarse quantizer — the partition-local search shape is
    identical. At 100 TB: corpus assignment is a one-pass broadcast
    map, the candidate join is an equi-join on the centroid id, and
    repartitioning by bucket co-locates each inverted list."""
    # default coarse quantizer: deterministic corpus sample; pass
    # `centroids` (e.g. kmeans_fit output renamed to (id, vec) cols)
    # for a trained quantizer — the search shape is identical
    cents = centroids if centroids is not None else emb.filter(
        F.col(id_col) < n_centroids
    )
    corpus = ivf_assign(emb, cents, probe=1, vec_col=vec_col, id_col=id_col)
    probes = ivf_assign(queries, cents, probe=probe, vec_col=vec_col, id_col=id_col)
    pairs = (
        corpus.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"), "bucket"
        )
        .join(
            F.broadcast(
                probes.select(
                    F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qe"),
                    "bucket",
                )
            ),
            "bucket",
        )
        .filter(F.col("cid") != F.col("qid"))
        .dropDuplicates(["qid", "cid"])
    )
    return _exact_rescore_topk(pairs, k)


def ann_topk_lsh(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    n_tables: int = 8, n_planes: int = 4, dim: int = 64,
) -> DataFrame:
    """Approximate top-k: rank only candidates sharing an LSH bucket
    with the query in ≥1 table. The candidate join is an equi-join on
    (table, bucket) — shuffle by bucket key, never a crossJoin — and
    (qid, cid) pairs found in several tables are deduplicated before
    scoring so each candidate is scored once."""
    qb = lsh_buckets(queries, n_tables, n_planes, dim=dim).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        "tbl", "bucket",
    )
    cb = lsh_buckets(emb, n_tables, n_planes, dim=dim).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
        "tbl", "bucket",
    )
    pairs = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("cid") != F.col("qid"))
        .dropDuplicates(["qid", "cid"])
    )
    return _exact_rescore_topk(pairs, k)


# ---------------------------------------------------------------------------
# k-means clustering (SURVEY §2.13): distributed Lloyd iterations
# ---------------------------------------------------------------------------

MEAN_SCALE = 1e9  # per-dimension fixed-point sum scale for centroid means


def _materialize_centroids(cents: DataFrame) -> DataFrame:
    """Truncate the Lloyd lineage (round-7 verdict #1).

    Each Lloyd update derives the new centroid table from a corpus-wide
    aggregation; left lazy, every downstream reference (the next
    iteration's broadcast assign, the final assignment, semdedup's
    self-join, PQ's ADC table) re-executes the WHOLE chain — live plans
    showed 15-40 `Scan parquet` nodes over the embeddings per query
    with zero exchange reuse, i.e. 15-40 full corpus reads at 100 TB
    where ~4 suffice. The centroid table is tiny (k, or 2^bits·k rows),
    so we eagerly localCheckpoint it after each update: the corpus is
    scanned exactly once per iteration, and the returned plan sees a
    leaf relation instead of the iterative subtree. Values are
    unchanged (fixed-point sums are materialization-invariant), so
    every oracle stays bit-identical."""
    return cents.localCheckpoint(eager=True)


def _kmeans_assign(v: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid by cosine: fixed-point dots, round-6 score,
    centroid-id tie-break. The k centroids arrive as ONE packed
    broadcast row and the argmax is a map-side array expression —
    genuinely no shuffle of the corpus (the previous form expanded k
    rows per vector and ranked them through a per-vector window, a
    full-corpus shuffle per assignment that contradicted this
    docstring's own scale claim)."""
    packed = _collect_centroids(cents, grouped=False)
    ids, _, _ = packed[0]
    scored = v.withColumn(
        "_sc", _score_udf(packed, grouped=False)(F.col("embedding"))
    )
    best = _best_from_scores(F.col("_sc"), ids, len(ids))[0]
    return scored.select(
        "vec_id",
        "embedding",
        (-best["negid"]).alias("bucket"),
        best["s"].alias("s"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd k-means over an embedding corpus.

    Scale shape (the only one that survives 100 TB):
      - assignment: broadcast k centroids, map-only argmax — no shuffle
        of the corpus;
      - update: ONE keyed shuffle per iteration (groupBy bucket) with
        map-side partial aggregation of per-dimension sums;
      - per-dimension sums are fixed-point bigints, so the reduce is
        order-independent — centroids are bit-identical across runs,
        cluster layouts, and engines (floor(x*1e9) summed, divided
        once at the end);
      - an emptied cluster keeps its previous centroid (left join +
        coalesce), never a null/NaN.

    Deterministic init: centroids = vectors with id < k (the same
    convention as the IVF coarse quantizer). Returns (assignment,
    centroids) after n_iter rounds."""
    v = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    # centroids live in double from the start so the iteration-1 output
    # (fixed-point means, double) coalesces against the same type
    cents = _materialize_centroids(
        v.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cent_id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "cent"
            ),
        )
    )
    for _ in range(n_iter):
        assigned = _kmeans_assign(v, cents)
        sums = assigned.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(
                    F.floor(
                        F.col("embedding")[i].cast("double") * F.lit(MEAN_SCALE)
                    ).cast("bigint")
                ).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        new = sums.select(
            F.col("bucket").alias("cent_id"),
            F.array(
                *[
                    F.col(f"s{i}").cast("double")
                    / (F.lit(MEAN_SCALE) * F.col("cnt").cast("double"))
                    for i in range(dim)
                ]
            ).alias("cent_new"),
        )
        cents = _materialize_centroids(
            cents.join(new, "cent_id", "left")
            .select(
                "cent_id",
                F.coalesce(F.col("cent_new"), F.col("cent")).alias("cent"),
            )
        )
    return _kmeans_assign(v, cents), cents


def _round6_ge_cut(threshold: float) -> float:
    """The smallest double whose round-half-up-to-6-dp value is >=
    ``threshold`` (a <=6-dp decimal like 0.35).

    Spark keeps a pair iff F.round(cos, 6) >= lit(threshold). HALF_UP
    rounding of a positive double x to 6 dp reaches threshold exactly
    when the EXACT binary value of x is >= threshold - 5e-7 (floor(y +
    0.5) >= K <=> y >= K - 0.5 for integer K; the 1e-6 rounding grid is
    ~10 orders of magnitude coarser than a double ulp near 0.35, so no
    representable k/1e6 falls between lit(threshold) and the decimal
    threshold). Doubles are totally ordered by their exact values, so
    the decision is a single numpy compare against the smallest double
    at-or-above that exact decimal cut.

    One-ulp caveat (the reason this is "equivalent" rather than
    "bit-identical to the JVM filter"): Spark's round() on DoubleType
    rounds the SHORTEST-DECIMAL-REPR of the double
    (BigDecimal.valueOf/Double.toString), while this cut compares the
    exact binary value. A double whose shortest repr IS the halfway
    decimal (e.g. prints as '0.3499995') but whose exact binary value
    lies just below it would be kept by the JVM round-then-compare yet
    dropped here. No computed cosine can land on that single double in
    practice, and the exact-value compare is the one that matches
    DuckDB's round() — which is the cross-engine contract the oracles
    pin — so the exact-binary cut is the intended semantics, not an
    approximation of the JVM's."""
    import math
    from decimal import Decimal

    cut = Decimal(str(threshold)) - Decimal("0.0000005")
    d = float(cut)
    if Decimal(d) < cut:
        d = math.nextafter(d, math.inf)
    return d


def _cluster_pair_stats(
    a: DataFrame, keys: list[str], threshold: float
) -> DataFrame:
    """Per-cluster near-dup pair statistics — (keys..., n_dup_pairs,
    n_pruned) over pairs vx < vy with round-6 cosine >= threshold —
    via a per-cluster Arrow block scorer that never materializes the
    pairs.

    History: the first cut was an equi-join self-join + per-pair HOF
    dot (interpreted lambda per pair*term — 337-438 s at soak x100);
    round 8 moved scoring to a numpy block product (same
    floor(x*y*1e12) arithmetic at memory bandwidth) but still EMITTED
    one row per qualifying pair for a JVM-side round-6 filter + count.
    That output is quadratic in duplicate multiplicity: a corpus where
    each vector has R exact replicas yields ~R^2/2 qualifying pairs per
    original — the x1000 soak (R=1000) crashed the Python workers
    materializing ~2.4e8 pair rows whose only consumer was a COUNT.
    The stats the operator actually returns are one row per cluster,
    so the scorer now aggregates in place: pair decisions stay
    vectorized block products, output is (n_dup_pairs, n_pruned) per
    group — O(clusters) rows however duplicate-heavy the corpus.

    Exactness contract (unchanged values, new location): the dots are
    the same floor(x*y*1e12) int64 products (bit-identical numpy/JVM),
    the cosine is the same double expression shape the JVM used, and
    the round-6 threshold decision reduces EXACTLY to one double
    compare (see _round6_ge_cut) — no approximate margin anywhere.
    n_pruned replays the JVM rule per kept pair: vx if sx > sy, vy if
    sy > sx, else max(vx, vy), distinct-counted (sx/sy are the round-6
    assignment scores, so the compares see identical doubles). Block
    size caps the (b, m, dim) float64 intermediate at ~50M elements,
    so oversized clusters spill to more blocks instead of OOMing.

    Round-13 unique-vector factoring (the q149 x1000 profile measured
    this scorer at 280 s of the 320 s total — scripts/q149_profile.py):
    a dedup corpus is replica-heavy BY DEFINITION, and the block
    product did full n² work per cluster even when the cluster was
    99.9% byte-identical copies. Byte-identical embeddings in one
    cluster carry identical assignment scores (s is a pure function of
    the embedding and the group's shared centroids — asserted, with a
    brute-force fallback), so the pair decisions factor EXACTLY over
    unique vectors:
      - dots/cosines are computed once per unique pair (and once per
        unique self-pair), with the identical floor arithmetic — only
        byte-identical rows merge (np.unique axis=0 compares raw
        bytes), so every computed double is the one the n² loop
        produced;
      - pair counts multiply out combinatorially: c_u*c_w per
        qualifying cross pair, C(c_u,2) per qualifying self pair;
      - the pruned-id DISTINCT count replays the per-pair rule in
        aggregate. For x < y the rule prunes x iff sx > sy, else y.
        Cross pair (u,w), s_u > s_w: every replica of u is the pruned
        side in every pairing (as x when smaller, as y when larger) →
        all of I_u. Equal s: each pair prunes its max id → the union
        minus its overall minimum. Self pair: all of I_u except
        min(I_u).
    Cost: O(m² · dim) for m unique vectors + O(n log n) to group —
    identical to before when every row is unique, linear in the
    replica count otherwise.

    Also returns n_members (= cluster row count): the callers
    previously computed it with a SECOND full aggregation of the
    assignment (re-executing the whole Lloyd lineage) joined back to
    these stats; the scorer already holds every member, so counting
    here deletes that corpus pass, its shuffle and the join
    (guide §2.4)."""
    import numpy as np

    fields = {f.name: f.dataType for f in a.schema.fields}
    out_schema = T.StructType(
        [T.StructField(kcol, fields[kcol]) for kcol in keys]
        + [
            T.StructField("n_members", T.LongType()),
            T.StructField("n_dup_pairs", T.LongType()),
            T.StructField("n_pruned", T.LongType()),
        ]
    )
    cut = _round6_ge_cut(threshold)

    def pair_flags(E: "np.ndarray", s: "np.ndarray", min_id: "np.ndarray",
                   cnt: "np.ndarray"):
        """Qualify/prune flags over the m unique vectors. Returns
        (n_pairs, prune_all, prune_nonmin): n_pairs is the replica-
        weighted qualifying pair count; prune_all[u] means every id of
        u is pruned; prune_nonmin[u] means every id but min(I_u)."""
        m = len(s)
        vn = np.floor(E * E * DOT_SCALE).astype(np.int64).sum(axis=1)
        nrm = np.sqrt(vn / DOT_SCALE)
        prune_all = np.zeros(m, dtype=bool)
        prune_nonmin = np.zeros(m, dtype=bool)
        n_pairs = 0
        # self pairs (replicas of one unique vector): raw(u,u) via the
        # exact expression the n² loop used for identical rows
        raw_self = (vn / DOT_SCALE) / (nrm * nrm)
        self_q = (cnt >= 2) & (raw_self >= cut)
        n_pairs += int((cnt[self_q] * (cnt[self_q] - 1) // 2).sum())
        prune_nonmin |= self_q
        b = max(1, 50_000_000 // max(1, m * E.shape[1]))
        for i0 in range(0, m - 1, b):
            i1 = min(i0 + b, m - 1)
            blk = (
                np.floor(E[i0:i1, None, :] * E[None, :, :] * DOT_SCALE)
                .astype(np.int64)
                .sum(axis=2)
            )
            raw = (blk / DOT_SCALE) / (nrm[i0:i1, None] * nrm[None, :])
            for li in range(i1 - i0):
                u = i0 + li
                j = np.nonzero(raw[li, u + 1:] >= cut)[0] + u + 1
                if not len(j):
                    continue
                n_pairs += int((cnt[u] * cnt[j]).sum())
                su, sj = s[u], s[j]
                if (su > sj).any():
                    prune_all[u] = True
                prune_all[j[sj > su]] = True
                eq = j[sj == su]
                if len(eq):
                    prune_nonmin[u] = True
                    prune_nonmin[eq] = True
                    if (min_id[eq] < min_id[u]).any():
                        prune_all[u] = True
                    prune_all[eq[min_id[eq] > min_id[u]]] = True
        return n_pairs, prune_all, prune_nonmin

    def stats_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        row = {kcol: [pdf[kcol].iloc[0]] for kcol in keys}
        row["n_members"] = [n]
        if n < 2:
            row["n_dup_pairs"] = [0]
            row["n_pruned"] = [0]
            return pd.DataFrame(row)
        pdf = pdf.sort_values("vec_id")  # first occurrence => min id
        E = np.array(list(pdf["embedding"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        s = pdf["s"].to_numpy()
        uniqE, first, inv, cnt = np.unique(
            E, axis=0, return_index=True, return_inverse=True,
            return_counts=True,
        )
        if not (s == s[first][inv]).all():
            # an identical embedding carried two different scores —
            # impossible for the production callers (s is derived from
            # the embedding and the group's centroids), but fall back
            # to the literal per-row scorer rather than miscount
            uniqE, first = E, np.arange(n)
            cnt = np.ones(n, dtype=np.int64)
        n_pairs, prune_all, prune_nonmin = pair_flags(
            uniqE, s[first], ids[first], cnt.astype(np.int64)
        )
        n_pruned = int(
            np.where(
                prune_all, cnt, np.where(prune_nonmin, cnt - 1, 0)
            ).sum()
        )
        row["n_dup_pairs"] = [n_pairs]
        row["n_pruned"] = [n_pruned]
        return pd.DataFrame(row)

    return a.select(*keys, "vec_id", "embedding", "s").groupBy(*keys).applyInPandas(
        stats_fn, out_schema
    )


def semdedup(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with k-means, enumerate
    near-duplicate pairs ONLY within clusters, and prune the member of
    each duplicate pair that sits closer to its centroid (keeping the
    lower-centroid-similarity example preserves diversity, the
    paper's selection rule).

    Returns per-cluster stats: (bucket, n_members, n_dup_pairs,
    n_pruned).

    Scale shape: the whole point of clustering first is to bound the
    quadratic — pairs are enumerated by an equi-join on the cluster
    id (shuffle on bucket, pairs never cross clusters), so the cost is
    sum(|cluster|²) instead of |corpus|²; with balanced k-means at
    k ∝ N/target the per-task work is constant. Dots are fixed-point
    zip_with/aggregate in codegen (no Python); scores are round-6 with
    id tie-breaks so pruning is deterministic across engines.
    """
    assigned, _ = kmeans_fit(emb, k=k, n_iter=n_iter, dim=dim)
    a = assigned.select("vec_id", "embedding", "bucket", "s")
    # within-cluster pair STATS via the Arrow block scorer: ONE shuffle
    # of the assignment, block-matmul fixed-point dots, counts AND the
    # member count aggregated inside the scorer (O(clusters) output
    # rows however duplicate-heavy the corpus — see _cluster_pair_stats;
    # round 13 folded n_members in, deleting the second full
    # aggregation of the assignment and the join back)
    return _cluster_pair_stats(a, ["bucket"], threshold).select(
        "bucket",
        "n_members",
        F.col("n_dup_pairs").cast("bigint").alias("n_dup_pairs"),
        F.col("n_pruned").cast("bigint").alias("n_pruned"),
    )


# ---------------------------------------------------------------------------
# scale-mode SemDeDup: coarse sign-LSH partition + per-group k-means
# ---------------------------------------------------------------------------

# plane-hash namespace for the coarse partition code — disjoint from
# lsh_buckets' table ids (0..n_tables-1) so the coarse split is
# statistically independent of the q49 ANN tables
COARSE_TABLE = 9001


def coarse_codes(
    emb: DataFrame,
    bits: int,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Single-table sign-LSH code of ``bits`` planes — the coarse,
    similarity-preserving partition key for :func:`semdedup_scaled`.
    Map-only; bits=0 puts the whole corpus in group 0.

    The plane dots run in an Arrow-vectorized scorer with the plane
    matrix in the closure (the same exact fixed-point integer
    arithmetic as _score_udf — floor(x*y*1e12) int64 products are
    bit-identical between numpy and the JVM, and the sign test / bit
    packing are integer ops): the coded corpus re-executes with every
    reference (init + each Lloyd iteration + the final assignment),
    and bits chained zip_with plane dots were the measured dominant
    interpreted cost of semdedup_scaled once assignment moved to the
    vectorized scorer."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
    )
    if bits == 0:
        return base.withColumn("coarse", F.lit(0).cast("bigint"))
    P = np.array(
        [
            [_plane_component(COARSE_TABLE, p, j) for j in range(dim)]
            for p in range(bits)
        ],
        dtype=np.float64,
    )
    weights = (1 << np.arange(bits, dtype=np.int64))

    @pandas_udf("bigint")
    def code(e: pd.Series) -> pd.Series:
        E = np.array(e.tolist(), dtype=np.float64)
        D = (
            np.floor(E[:, None, :] * P[None, :, :] * DOT_SCALE)
            .astype(np.int64)
            .sum(axis=2)
        )
        return pd.Series(((D > 0) * weights[None, :]).sum(axis=1))

    return base.withColumn("coarse", code(F.col("embedding")))


def _kmeans_assign_grouped(v: DataFrame, cents: DataFrame) -> DataFrame:
    """Per-group nearest centroid: one packed row PER GROUP, broadcast
    hash equi-join on the group key, so each vector scores only its
    own group's k centroids and the argmax stays a map-side array
    expression — per-row work is O(k) however large G grows, and there
    is no shuffle of the corpus (see _kmeans_assign)."""
    packed = _collect_centroids(cents, grouped=True)
    # the argmax expression labels buckets by POSITION (one shared
    # candidate list across groups), so every group's cent_ids must be
    # exactly 0..k_g-1 — true for both production inits (rank-1, and
    # vec_id<k over dense ids). A non-dense init would otherwise make
    # the Lloyd update join miss every (coarse, cent_id) key and
    # silently freeze the centroids; fail loudly instead.
    for g, (ids, _, _) in packed.items():
        if ids != list(range(len(ids))):
            raise ValueError(
                f"grouped k-means needs per-group cent_ids 0..k-1; "
                f"group {g} has {ids}"
            )
    k_max = max(len(ids) for ids, _, _ in packed.values())
    scored = v.withColumn(
        "_sc",
        _score_udf(packed, grouped=True)(
            F.col("embedding"), F.col("coarse")
        ),
    )
    best = _best_from_scores(F.col("_sc"), list(range(k_max)), k_max)[0]
    return scored.select(
        "coarse",
        "vec_id",
        "embedding",
        (-best["negid"]).alias("bucket"),
        best["s"].alias("s"),
    ).filter(F.col("bucket").isNotNull())


def kmeans_fit_grouped(
    v: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    init: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd k-means run independently inside every ``coarse`` group of
    ``v`` (columns: coarse, vec_id, embedding) — the grouped twin of
    :func:`kmeans_fit` with the same fixed-point/tie-break discipline.

    Scale shape: with G groups of k centroids each, assignment is a
    broadcast equi-join on the group key (G·k centroid rows broadcast;
    each vector scores only k candidates → N·k scored rows, independent
    of G), and the update is one keyed shuffle on (coarse, bucket).
    Total cost is O(N·k) per iteration however large G grows — this is
    what lets the centroid count track the corpus while the plan stays
    linear.

    Deterministic init: the k lowest vec_ids of each group, cent_id =
    rank-1 (reduces to kmeans_fit's vec_id<k convention for bits=0 over
    dense ids). Callers whose groups all contain the same dense id set
    (PQ subspaces) pass ``init`` (columns: coarse, cent_id 0..k-1,
    cent as double array) built from a plain filter — same centroids,
    but skips the full window shuffle of v that the rank-based default
    needs."""
    if init is None:
        w0 = Window.partitionBy("coarse").orderBy("vec_id")
        init = (
            v.withColumn("rn", F.row_number().over(w0))
            .filter(F.col("rn") <= k)
            .select(
                "coarse",
                (F.col("rn") - 1).cast("bigint").alias("cent_id"),
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double")
                ).alias("cent"),
            )
        )
    cents = _materialize_centroids(init)
    for _ in range(n_iter):
        assigned = _kmeans_assign_grouped(v, cents)
        sums = assigned.groupBy("coarse", "bucket").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(
                    F.floor(
                        F.col("embedding")[i].cast("double") * F.lit(MEAN_SCALE)
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
                    / (F.lit(MEAN_SCALE) * F.col("cnt").cast("double"))
                    for i in range(dim)
                ]
            ).alias("cent_new"),
        )
        cents = _materialize_centroids(
            cents.join(new, ["coarse", "cent_id"], "left")
            .select(
                "coarse",
                "cent_id",
                F.coalesce(F.col("cent_new"), F.col("cent")).alias("cent"),
            )
        )
    return _kmeans_assign_grouped(v, cents), cents


def semdedup_scaled(
    emb: DataFrame,
    bits: int = 4,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    threshold: float = 0.35,
) -> DataFrame:
    """:func:`semdedup` in its at-scale configuration: a coarse
    sign-LSH partition (2^bits similarity-preserving groups) followed
    by per-group k-means, so the TOTAL cluster count (2^bits · k)
    tracks the corpus while every stage stays linear in N.

    Why this exists: plain semdedup at fixed k has sum(|cluster|²)
    within-cluster pair cost — 10× the corpus means ~100× the pairs
    (the bench soak measures exactly this degradation). Growing k
    directly instead makes exact Lloyd assignment N·k ∝ N² — the paper
    sidesteps it with GPU faiss. The coarse-partition form is the
    engine-native fix: bits is a deployment knob sized to the corpus
    (bits ≈ log2(N / (target_cluster_size · k))), giving
      - coarse codes: map-only, N·bits;
      - k-means: N·k per iteration (grouped broadcast join — see
        kmeans_fit_grouped);
      - pair enumeration: equi-join on (coarse, bucket), ~N·target
        pairs.
    The recall trade is the standard LSH one — a near-dup pair split by
    a coarse hyperplane is missed, the same contract as lsh_buckets /
    minhash bands (amplify with bands there; here dedup needs single
    assignment, so the boundary costs a few % recall and is documented
    rather than hidden).

    bits=0 reduces exactly to semdedup(k=k) over dense vec_ids (tested).
    Returns per-cluster stats keyed (coarse, bucket)."""
    v = coarse_codes(emb, bits, dim=dim)
    assigned, _ = kmeans_fit_grouped(v, k=k, n_iter=n_iter, dim=dim)
    a = assigned.select("coarse", "vec_id", "embedding", "bucket", "s")
    # within-(group, cluster) pair STATS via the Arrow block scorer —
    # see semdedup / _cluster_pair_stats (n_members folded in, round 13)
    return _cluster_pair_stats(a, ["coarse", "bucket"], threshold).select(
        "coarse",
        "bucket",
        "n_members",
        F.col("n_dup_pairs").cast("bigint").alias("n_dup_pairs"),
        F.col("n_pruned").cast("bigint").alias("n_pruned"),
    )


def pq_ann_topk(
    emb: DataFrame,
    n_queries: int = 10,
    m: int = 4,
    ksub: int = 4,
    n_iter: int = 1,
    dim: int = 64,
    k: int = 5,
    rescore: int = 0,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, IEEE TPAMI 33(1)):
    split vectors into m subspaces, k-means a codebook per subspace,
    encode the corpus as m small codes, and answer queries by ADC
    (asymmetric distance computation) — a table lookup per subspace
    instead of a full-dimension scan.

    Scale shape: ALL m codebooks train in one corpus pass per Lloyd
    iteration — each row explodes map-side into its m subspace slices
    keyed by the subspace index, and kmeans_fit_grouped runs the m
    independent Lloyd problems as groups of that key (broadcast
    assign, one keyed (sub, bucket) shuffle per update). Per-subspace
    kmeans_fit was the previous form and cost m corpus scans per
    iteration for identical arithmetic — the exploded rows carry the
    same total element count, so compute is unchanged and the corpus
    is read once. The corpus is stored as (vec_id, subspace, code) —
    m ints per vector instead of dim floats, the 16-64x memory
    compression that lets 100 TB of embeddings fit an index; query
    time joins the code stream against a BROADCAST table of
    n_queries x m x ksub partial dots, so scoring is a map-side hash
    join + one keyed sum shuffle — the corpus embeddings themselves
    are never touched after encoding.

    Determinism: subspace assignment is kmeans_fit's round-6 cosine
    with id tie-breaks (init = vec_id < ksub per subspace, bit-equal
    to the per-subspace form, oracle-pinned); ADC partials stay bigint
    fixed-point until one final division, so the cross-subspace sum is
    order-independent.

    rescore > 0 adds the standard production tail (Jégou et al. 2011
    §V.C — IVFADC + re-ranking; round-10 verdict #3): the ADC pass
    selects the top-`rescore` candidates per query, then ONE more
    corpus pass fetches just those candidates' full embeddings
    (broadcast hash semi-join on the n_q·rescore id set — the scan
    prunes to the candidate rows, nothing shuffles) and the final
    top-k is ranked by EXACT fixed-point cosine (q48's scorer, bit-
    identical rounding). Quantization error then only matters for
    candidate RECALL, not final ordering — recall@5 at the 16x
    compression point rises from ~0.2 to wherever P(true top-k ∈ ADC
    top-`rescore`) sits (~3x here), for one cheap extra scan. Output
    columns become (qid, cid, rank, score=exact cosine).
    """
    sub_dim = dim // m
    v = emb.select("vec_id", "embedding")

    vg = v.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("bigint").alias("coarse"),
                        F.slice(
                            "embedding", s * sub_dim + 1, sub_dim
                        ).alias("emb"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("se"),
    ).select(
        F.col("se.coarse").alias("coarse"),
        "vec_id",
        F.col("se.emb").alias("embedding"),
    )
    init = vg.filter(F.col("vec_id") < ksub).select(
        "coarse",
        F.col("vec_id").alias("cent_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "cent"
        ),
    )
    assigned, cents = kmeans_fit_grouped(
        vg, k=ksub, n_iter=n_iter, dim=sub_dim, init=init
    )
    codes = assigned.select(
        "vec_id", F.col("coarse").alias("sub"), F.col("bucket").alias("code")
    )
    book = cents.select(
        F.col("coarse").alias("sub"), "cent_id", "cent"
    )

    queries = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )
    # ADC lookup table: per (query, subspace, code) partial dot (bigint fp)
    table = (
        queries.join(F.broadcast(book))
        .select(
            "qid",
            "sub",
            F.col("cent_id").alias("code"),
            _dot_fp_unrolled(
                F.slice("q", F.col("sub") * sub_dim + 1, sub_dim),
                F.col("cent"),
                sub_dim,
            ).alias("pd_fp"),
        )
    )
    scored = (
        codes.join(F.broadcast(table), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(
            (F.sum("pd_fp").cast("double") / F.lit(DOT_SCALE)).alias("adc_score")
        )
        .withColumn("adc_score", F.round("adc_score", 6))
    )
    # two-level rank — a single per-qid window would funnel a query's
    # whole corpus to one reducer (see cosine_topk)
    keep = max(k, rescore)
    w_local = Window.partitionBy(
        "qid", F.pmod(F.hash("cid"), F.lit(32))
    ).orderBy(F.desc("adc_score"), F.asc("cid"))
    cand = (
        scored.withColumn("r1", F.row_number().over(w_local))
        .filter(F.col("r1") <= keep)
        .drop("r1")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("adc_score"), F.asc("cid"))
    ranked = cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= keep
    )
    if rescore <= 0:
        return ranked.filter(F.col("rank") <= k).select(
            "qid", "cid", "rank", "adc_score"
        )
    # exact-rescore tail: the (qid, cid) candidate pairs are a bounded
    # n_q·rescore set — broadcast them against the corpus ONCE to pull
    # the candidate embeddings, then rank by q48's exact fixed-point
    # cosine (identical rounding/tie-breaks, so the oracle replays it)
    pairs = ranked.select("qid", "cid")
    c = with_norm(
        v.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")),
        "ce",
    ).withColumnRenamed("nrm", "cnrm")
    q = with_norm(
        v.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
        ),
        "qe",
    ).withColumnRenamed("nrm", "qnrm")
    rescored = (
        c.join(F.broadcast(pairs), "cid")
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "cid",
            F.round(
                _dot(F.col("qe"), F.col("ce"))
                / (F.col("qnrm") * F.col("cnrm")),
                6,
            ).alias("score"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        rescored.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank", "score")
    )
