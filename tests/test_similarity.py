"""Similarity-search invariants (SURVEY §2.13): exact top-k shape and
multi-table LSH recall against the exact baseline."""

from __future__ import annotations

import pytest

from streamprocess_spark.plans import query_map
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def results(spark):
    exact = query_map()["q48_embedding_topk"](spark, SF_DIR).collect()
    ann = query_map()["q49_ann_lsh_topk"](spark, SF_DIR).collect()
    return exact, ann


def test_exact_topk_shape(results):
    exact, _ = results
    by_q: dict[int, list] = {}
    for r in exact:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == 10  # vec_id < 10 query set
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.cid != qid for r in rows)


def test_ann_recall_vs_exact(results):
    """Multi-table sign-LSH (8 tables x 4 planes) must recover a
    meaningful fraction of the exact top-5 — single-table LSH scored
    0.02 here, the multi-table index ~0.66."""
    exact, ann = results
    e = {(r.qid, r.cid) for r in exact}
    a = {(r.qid, r.cid) for r in ann}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"LSH recall degraded: {recall:.2f}"


def test_ann_is_subset_ranking(results):
    _, ann = results
    for r in ann:
        assert 1 <= r.rank <= 5
        assert -1.0 <= r.cos_sim <= 1.0


def test_cosine_topk_collected_arm_bit_equal(spark):
    """Round-12: cosine_topk(collected_queries=True) — the Arrow block
    scorer q48 ships — must be row-for-row identical to the broadcast
    HOF arm: same fixed-point per-term arithmetic (floor(x·y·1e12)
    int64), same rounding/tie-breaks in Catalyst."""
    from pyspark.sql import functions as F

    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators.similarity import cosine_topk

    emb = load_tables(spark, SF_DIR)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, cosine_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, cosine_topk(
        emb, queries, k=5, collected_queries=True).collect()))
    assert a == b
    assert len(a) == 50


def test_kmeans_inertia_decreases_and_deterministic(spark):
    """Lloyd invariants: every vector assigned exactly once; mean
    round-6 cosine distance to the assigned centroid does not increase
    with more update rounds; identical runs are bit-identical."""
    from pyspark.sql import functions as F

    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators.similarity import kmeans_fit
    from tests.conftest import SF_DIR

    emb = load_tables(spark, SF_DIR)["embeddings"]
    n = emb.count()

    def inertia(n_iter: int) -> float:
        assigned, _ = kmeans_fit(emb, k=8, n_iter=n_iter, dim=64)
        agg = assigned.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.lit(1.0) - F.col("s")).alias("inertia"),
        ).first()
        assert agg["n"] == n
        return float(agg["inertia"])

    i0, i1, i2 = inertia(0), inertia(1), inertia(2)
    assert i1 <= i0 + 1e-9 and i2 <= i1 + 1e-9, (i0, i1, i2)
    assert i1 < i0, "first update round must strictly improve on init"

    def run() -> "object":
        return (
            kmeans_fit(emb, k=8, n_iter=2, dim=64)[0]
            .select("vec_id", "bucket", "s")
            .toPandas()
            .sort_values("vec_id", ignore_index=True)
        )

    assert run().equals(run())


def test_pq_adc_recall_vs_exact(spark):
    """PQ/ADC (q111) is a coarse quantization (m=4, k_sub=8 → 4096
    distinct code words): it must still place a meaningful share of
    the exact top-5 in its top-5 (recall floor), and every query must
    return exactly 5 ranked rows."""
    exact = query_map()["q48_embedding_topk"](spark, SF_DIR).collect()
    pq = query_map()["q111_pq_ann"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in pq:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == 10
    for qid, rows in by_q.items():
        assert sorted(r.rank for r in rows) == [1, 2, 3, 4, 5]
        assert all(r.cid != qid for r in rows)
    e = {(r.qid, r.cid) for r in exact}
    a = {(r.qid, r.cid) for r in pq}
    recall = len(e & a) / len(e)
    assert recall >= 0.1, f"ADC recall collapsed: {recall:.2f}"


# ---------------------------------------------------------------------------
# scale-mode SemDeDup (q149): coarse sign-LSH partition + grouped k-means
# ---------------------------------------------------------------------------


def test_semdedup_scaled_bits0_reduces_to_semdedup(spark):
    """bits=0 puts the whole corpus in coarse group 0, and the grouped
    init (k lowest vec_ids per group, cent_id = rank-1) coincides with
    kmeans_fit's vec_id<k convention over the dense embedding ids — so
    semdedup_scaled must reproduce semdedup EXACTLY, row for row."""
    import streamprocess_spark.operators.similarity as S
    from streamprocess_spark.io.tables import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]
    plain = {tuple(r) for r in
             S.semdedup(emb, k=8, n_iter=2, dim=64, threshold=0.35).collect()}
    scaled = S.semdedup_scaled(
        emb, bits=0, k=8, n_iter=2, dim=64, threshold=0.35).collect()
    assert all(r.coarse == 0 for r in scaled)
    assert {tuple(r)[1:] for r in scaled} == plain


def test_semdedup_scaled_partition_accounting(spark):
    """Every vector lands in exactly one (coarse, bucket): member
    counts over the scaled stats must sum to the corpus size, groups
    must stay within 2^bits, and per-group cluster ids within k."""
    import streamprocess_spark.operators.similarity as S
    from streamprocess_spark.io.tables import load_tables

    bits, k = 2, 4
    emb = load_tables(spark, SF_DIR)["embeddings"]
    rows = S.semdedup_scaled(
        emb, bits=bits, k=k, n_iter=2, dim=64, threshold=0.35).collect()
    assert sum(r.n_members for r in rows) == emb.count()
    assert {r.coarse for r in rows} <= set(range(1 << bits))
    assert all(0 <= r.bucket < k for r in rows)
    assert all(r.n_pruned <= r.n_dup_pairs for r in rows)
    # the coarse split must actually divide the corpus (not collapse
    # into one group — a broken plane hash would do that silently)
    assert len({r.coarse for r in rows}) >= 2


def test_semdedup_scaled_pair_work_is_bounded_by_partitioning(spark):
    """The linearity witness: at fixed target cluster size, doubling
    bits (4x groups) must cut the within-cluster pair count roughly
    proportionally — sum(|cluster| choose 2) is the actual work the
    coarse partition exists to bound."""
    import streamprocess_spark.operators.similarity as S
    from streamprocess_spark.io.tables import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]

    def pair_work(bits):
        rows = S.semdedup_scaled(
            emb, bits=bits, k=4, n_iter=1, dim=64, threshold=2.0).collect()
        return sum(r.n_members * (r.n_members - 1) // 2 for r in rows)

    w0, w2 = pair_work(0), pair_work(2)
    # 4x more clusters must reduce candidate pairs by at least 2x
    # (exact factor depends on balance; collapse to ~1x would mean the
    # coarse codes are not partitioning)
    assert w2 * 2 <= w0, (w0, w2)


# ---------------------------------------------------------------------------
# Arrow scorer exactness (round 8): the assignment UDF's load-bearing
# assumption is that numpy's floor(x*y*1e12) int64 fixed-point products
# equal the JVM expression's, bit for bit. Pin it differentially.
# ---------------------------------------------------------------------------


def test_arrow_scorer_matches_jvm_fixed_point(spark):
    """Compute the fixed-point dot of every corpus vector against a
    centroid set BOTH ways — the JVM zip_with/aggregate expression and
    the Arrow scorer's int64 output — and require exact equality, for
    the self-dot too. Any IEEE divergence between numpy and the JVM
    (or a drifted DOT_SCALE/floor semantics) fails this directly
    instead of surfacing as a mysterious oracle hash mismatch."""
    from pyspark.sql import functions as F

    import streamprocess_spark.operators.similarity as S
    from streamprocess_spark.io.tables import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]
    cents = S._materialize_centroids(
        emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cent_id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
            .alias("cent"),
        )
    )
    packed = S._collect_centroids(cents, grouped=False)
    ids, C, cnfps = packed[0]
    scored = emb.select(
        "vec_id",
        S._score_udf(packed, grouped=False)(
            F.col("embedding")
        ).alias("sc"),
    )
    jvm_dots = [
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(x)) for x in C[i]]),
                lambda x, y: F.floor(
                    x.cast("double") * y.cast("double") * F.lit(S.DOT_SCALE)
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias(f"jd{i}")
        for i in range(len(ids))
    ]
    jvm_self = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("embedding"),
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(S.DOT_SCALE)
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    ).alias("jself")
    both = scored.join(
        emb.select("vec_id", *jvm_dots, jvm_self), "vec_id"
    ).collect()
    assert both
    for r in both:
        assert r["sc"]["vnfp"] == r["jself"], r["vec_id"]
        for i in range(len(ids)):
            assert r["sc"]["dots"][i] == r[f"jd{i}"], (r["vec_id"], i)
        assert list(r["sc"]["cnfps"]) == [int(x) for x in cnfps]


def test_ivf_assign_honors_probe_beyond_two(spark):
    """probe >= 3 regression: the first cut of the array-expression
    argmax silently truncated every probe above 2 (the old row_number
    form honored any probe). Each vector must get exactly `probe`
    DISTINCT buckets, and the probe-2 set must be a prefix of the
    probe-3 set (same ordering, one more pick)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators.similarity import ivf_assign

    emb = load_tables(spark, SF_DIR)["embeddings"].filter(
        F.col("vec_id") < 200
    )
    cents = emb.filter(F.col("vec_id") < 6)

    def buckets(probe):
        out = defaultdict(list)
        for r in ivf_assign(emb, cents, probe=probe).collect():
            out[r["vec_id"]].append(r["bucket"])
        return out

    b2, b3 = buckets(2), buckets(3)
    assert set(b2) == set(b3)
    for vid, bs in b3.items():
        assert len(bs) == 3 and len(set(bs)) == 3, (vid, bs)
        assert bs[:2] == b2[vid], (vid, bs, b2[vid])


# ---------------------------------------------------------------------------
# Round-13 unique-vector factoring of _cluster_pair_stats: pin the
# factored counts against a literal per-pair reference (the pre-r13
# implementation's exact rule) on adversarial fixtures — replica-heavy
# corpora, round-6 score ties across DISTINCT vectors, and the
# inconsistent-score fallback.
# ---------------------------------------------------------------------------


def _pair_stats_reference(rows, threshold):
    """The pre-round-13 per-pair loop, verbatim semantics: for every
    pair vx < vy with round-6 cosine >= threshold (floor(x*y*1e12)
    fixed-point dots), count it, and prune vx if sx > sy else vy if
    sy > sx else max(vx, vy); n_pruned distinct-counts the pruned."""
    import numpy as np

    from streamprocess_spark.operators.similarity import (
        DOT_SCALE, _round6_ge_cut,
    )

    cut = _round6_ge_cut(threshold)
    rows = sorted(rows)  # by vec_id
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    E = np.array([r[1] for r in rows], dtype=np.float64)
    s = np.array([r[2] for r in rows], dtype=np.float64)
    vn = np.floor(E * E * DOT_SCALE).astype(np.int64).sum(axis=1)
    nrm = np.sqrt(vn / DOT_SCALE)
    n_pairs, pruned = 0, set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            dot = int(np.floor(E[i] * E[j] * DOT_SCALE)
                      .astype(np.int64).sum())
            raw = (dot / DOT_SCALE) / (nrm[i] * nrm[j])
            if raw >= cut:
                n_pairs += 1
                if s[i] > s[j]:
                    pruned.add(int(ids[i]))
                elif s[j] > s[i]:
                    pruned.add(int(ids[j]))
                else:
                    pruned.add(int(max(ids[i], ids[j])))
    return n_pairs, len(pruned)


@pytest.mark.parametrize("case", ["replicas", "ties", "fallback"])
def test_cluster_pair_stats_factoring_matches_per_pair_rule(spark, case):
    import numpy as np

    from streamprocess_spark.operators.similarity import _cluster_pair_stats

    rng = np.random.default_rng(13)
    base = rng.normal(size=(6, 8))
    # three near-dup families + noise, then exact replicas with
    # distinct ids — the x1000 soak corpus shape
    vecs, scores = [], []
    for i, b in enumerate(base):
        vecs.append(b)
        scores.append(round(0.5 + 0.01 * i, 6))
    vecs.append(base[0] + 1e-9)            # near-dup, distinct bytes
    scores.append(scores[0])               # round-6 TIE across vectors
    rows = []
    vid = 0
    for v, sc in zip(vecs, scores):
        reps = 4 if case in ("replicas", "fallback") else 1
        for r in range(reps):
            sc_r = sc
            if case == "fallback" and r == 3:
                sc_r = sc + 0.25           # replica with a DIFFERENT
                # score: production can't produce this, the factoring
                # must detect it and take the per-row path
            rows.append((vid, [float(x) for x in v], sc_r))
            vid += 7                       # non-dense ids
    threshold = 0.2
    df = spark.createDataFrame(
        [(0, i, e, s) for (i, e, s) in rows],
        "bucket long, vec_id long, embedding array<double>, s double",
    )
    got = _cluster_pair_stats(df, ["bucket"], threshold).collect()
    assert len(got) == 1
    ref_pairs, ref_pruned = _pair_stats_reference(
        [(i, e, s) for (i, e, s) in rows], threshold
    )
    assert got[0].n_members == len(rows)
    assert got[0].n_dup_pairs == ref_pairs, case
    assert got[0].n_pruned == ref_pruned, case


def test_cluster_pair_stats_randomized_against_per_pair_rule(spark):
    """Property sweep: random clusters with random replica
    multiplicities and quantized scores (forcing cross-vector ties)
    must match the per-pair reference exactly, for several seeds and
    thresholds."""
    import numpy as np

    from streamprocess_spark.operators.similarity import _cluster_pair_stats

    clusters = []
    all_rows = []
    for seed in range(6):
        rng = np.random.default_rng(seed)
        n_uniq = int(rng.integers(1, 8))
        vid = int(rng.integers(0, 50))
        rows = []
        for _ in range(n_uniq):
            v = [float(x) for x in rng.normal(size=6)]
            sc = round(float(rng.integers(0, 4)) / 4.0, 6)  # tie-prone
            for _ in range(int(rng.integers(1, 5))):
                rows.append((vid, v, sc))
                vid += int(rng.integers(1, 9))
        clusters.append((seed, rows))
        all_rows.extend((seed, i, e, s) for (i, e, s) in rows)
    df = spark.createDataFrame(
        all_rows,
        "bucket long, vec_id long, embedding array<double>, s double",
    )
    threshold = 0.1
    got = {r.bucket: r for r in
           _cluster_pair_stats(df, ["bucket"], threshold).collect()}
    for seed, rows in clusters:
        ref_pairs, ref_pruned = _pair_stats_reference(
            [(i, e, s) for (i, e, s) in rows], threshold
        )
        g = got[seed]
        assert g.n_members == len(rows), seed
        assert (g.n_dup_pairs, g.n_pruned) == (ref_pairs, ref_pruned), seed
