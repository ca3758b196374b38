"""Deduplication operators (SURVEY §2.13): exact, MinHash+LSH banding,
SimHash, n-gram Jaccard.

Design for 100 TB:
  - Everything is expressed as explode → hash → groupBy → band-join;
    the only shuffles are keyed by doc_id (signature build) and by band
    key (candidate join) — the standard scalable LSH layout. No
    driver-side collection, no O(n²) all-pairs stage; pair enumeration
    happens only inside LSH buckets.
  - Hashing uses md5 (identical in Spark and DuckDB) folded to a
    60-bit int, so every stage is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007
# Fixed affine permutation constants (a_i odd, b_i prime-ish). k=8
# hashes → 4 bands × 2 rows: detects pairs with Jaccard ≳ 0.5.
MINHASH_A = (131, 137, 139, 149, 151, 157, 163, 167)
MINHASH_B = (101, 211, 307, 401, 503, 601, 701, 809)
N_BANDS = 4
ROWS_PER_BAND = 2

SIMHASH_BITS = 48          # 3 pigeonhole segments of 16 bits
SIMHASH_SEG_BITS = 16
SIMHASH_SEGMENTS = SIMHASH_BITS // SIMHASH_SEG_BITS


def token_hash(tok: Column) -> Column:
    """md5-based 60-bit token hash, reduced mod 1e9+7. Engine-agnostic:
    DuckDB equivalent is ('0x' || substr(md5(t),1,15))::BIGINT % MOD."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint") % MOD


SHINGLE_N = 3  # word n-gram shingles: order-sensitive, so random word
# soup is distinct while copied/perturbed passages collide — token SETS
# would make every doc in a small-vocab corpus a near-dup of every other


def doc_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = SHINGLE_N
) -> DataFrame:
    """One row per (doc, distinct word n-gram shingle)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "").alias("toks"),
    )
    # guard: Spark sequence(0, -k) counts DOWN — short docs need an
    # explicit empty index array
    idx = F.when(
        F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - n)
    ).otherwise(F.array().cast("array<int>"))
    return toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(" ", *[F.col("toks")[i + j] for j in range(n)]),
                )
            )
        ).alias("tok"),
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate clusters: md5(content) → canonical id (min) +
    cluster size. Equivalent to dropDuplicates + survivor choice, but
    reports the clusters."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """k min-hash values per document (columns m0..m{k-1}) over word
    3-gram shingles."""
    toks = doc_shingles(df, id_col, text_col)
    hashed = toks.select("doc_id", token_hash(F.col("tok")).alias("hv"))
    aggs = [
        F.min((F.lit(a) * F.col("hv") + F.lit(b)) % MOD).alias(f"m{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_bands(sig: DataFrame) -> DataFrame:
    """Band the signature: one row per (doc, band_idx, band_key).

    Single explode over an inline struct array — NOT a union of
    per-band selects: a union would make Catalyst recompute the whole
    signature subtree (shingle explode + groupBy shuffle) once per
    band, turning one document scan into N_BANDS scans at 100 TB."""
    bands_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            (
                F.col(f"m{b * ROWS_PER_BAND}") * MOD
                + F.col(f"m{b * ROWS_PER_BAND + 1}")
            ).alias("band_key"),
        )
        for b in range(N_BANDS)
    ])
    return sig.select("doc_id", F.explode(bands_arr).alias("bk")).select(
        "doc_id", "bk.band", "bk.band_key"
    )


def minhash_candidates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band.
    Join is keyed on (band, band_key) — bucket-local pair expansion
    only, the scalable path at 100 TB.

    The self-join carries an explicit MERGE hint (round-12 measured
    A/B at sf0.1 / ×10 / ×100: 0.54/0.97/3.80 s vs auto-planned
    0.66/1.24/4.79 s vs a collect_list bucket-grouping form
    0.49/1.30/4.04 s). Left to size estimates, Catalyst broadcasts one
    side — i.e. collects the ENTIRE banded corpus (2·N_BANDS·n rows)
    to the driver and recomputes the signature subtree (tokenize →
    shingle explode → md5 → 8-way min) under the broadcast, both
    unbounded at 100 TB. With the merge hint the two sides are
    byte-identical shuffle subtrees, so AQE's exchange reuse computes
    the signature + band exchange ONCE and sorts it twice — no driver
    collect, no duplicate subtree, shuffle bytes linear in the corpus
    regardless of duplication rate."""
    bands = minhash_bands(minhash_signatures(df, id_col, text_col))
    left = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_key"
    )
    return (
        left.join(right.hint("merge"), ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
    max_iter: int = 25, stats: dict | None = None,
) -> DataFrame:
    """Duplicate-cluster resolution: undirected candidate pairs →
    ``(doc_id, cluster_id)`` where cluster_id is the minimum doc id in
    the connected component (hash-min label propagation).

    This is the stage LSH pipelines need AFTER candidate generation:
    near-dup relations are not transitive pairwise, but dedup decisions
    must be (keep one doc per cluster), so components are the unit of
    survivorship.

    Scale design:
      - each iteration is one keyed shuffle (neighbor-min groupBy) +
        one outer join — the standard distributed CC; rounds needed =
        component diameter, which for dup clusters is tiny (near-dup
        graphs are dense cliques, typically 2-4 rounds);
      - ``localCheckpoint(eager)`` truncates lineage each round, or the
        plan tree (and task binary) doubles per iteration — the classic
        iterative-DataFrame failure mode at scale;
      - convergence is detected with a scalar changed-count per round
        (a driver-side scalar, not a data collect).

    ``stats``, when given, receives ``{"rounds": r}`` — the number of
    label-propagation rounds executed before convergence (including
    the final no-change round). Convergence cost depends on component
    diameter, so soak runs record this per leg.
    """
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    edges_sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges_sym.select(F.col("src").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (
            edges_sym.join(labels, edges_sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["dst"], "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") < F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SimHash fingerprint (SIMHASH_BITS wide) per document: per-shingle
    md5 bits, ±1 weighted sum per bit position, sign → bit."""
    toks = doc_shingles(df, id_col, text_col)
    hashed = toks.select("doc_id", token_hash(F.col("tok")).alias("hv"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = hashed.groupBy("doc_id").agg(*bit_sums)
    fp = F.lit(0).cast("bigint")
    for j in range(SIMHASH_BITS):
        fp = fp + F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(0).cast("bigint")
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_segments(fps: DataFrame) -> DataFrame:
    """One row per (doc, segment_idx, segment_value): pigeonhole
    decomposition of the fingerprint. Any pair within hamming ≤
    SIMHASH_SEGMENTS - 1 shares at least one EXACT segment, so
    candidates come from an equi-join on (seg, seg_val) — fine-grained
    buckets (2^16 per segment), never a byte-bucket cross join."""
    segs = F.array(*[
        F.struct(
            F.lit(i).alias("seg"),
            F.shiftright("simhash", i * SIMHASH_SEG_BITS)
            .bitwiseAND(F.lit((1 << SIMHASH_SEG_BITS) - 1))
            .alias("seg_val"),
        )
        for i in range(SIMHASH_SEGMENTS)
    ])
    return fps.select(
        "doc_id", "simhash", F.explode(segs).alias("s")
    ).select("doc_id", "simhash", "s.seg", "s.seg_val")


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming
    (must be < SIMHASH_SEGMENTS for the pigeonhole guarantee to make
    candidate generation exact, not approximate)."""
    assert max_hamming < SIMHASH_SEGMENTS
    fps = simhash(df, id_col, text_col)
    sa = simhash_segments(fps).select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"),
        "seg", "seg_val",
    )
    sb = simhash_segments(fps).select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"),
        "seg", "seg_val",
    )
    pairs = (
        sa.join(sb, ["seg", "seg_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return pairs.select(
        "doc_a", "doc_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str,
    n: int = SHINGLE_N, threshold: float = 0.5, sample_mod: int = 2,
    df_cap: int | None = 1000,
) -> DataFrame:
    """n-gram Jaccard similarity on a deterministic 1/sample_mod gram
    sketch (keep grams with H(g) % sample_mod == 0 — consistent across
    docs, so sketch-Jaccard ≈ true Jaccard). Pairs sharing ≥1 sketched
    gram are candidates; exact set sizes come from per-doc counts.

    df_cap: drop grams whose document frequency exceeds the cap BEFORE
    the pair join. Without it a stop-gram present in m documents emits
    m² candidate pairs — the guaranteed pathological case in natural
    language at 100 TB. A capped gram carries ~zero Jaccard signal
    anyway (it matches everything); sizes are computed after the cap so
    the Jaccard stays consistent on the capped sketch."""
    grams = (
        doc_shingles(df, id_col, text_col, n)
        .withColumn("gh", token_hash(F.col("tok")))
        .filter(F.col("gh") % sample_mod == 0)
    )
    if df_cap is not None:
        rare = (
            grams.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("gram_df"))
            .filter(F.col("gram_df") <= df_cap)
            .select("gh")
        )
        grams = grams.join(rare, "gh")
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.select(F.col("doc_id").alias("doc_a"), "gh")
    b = grams.select(F.col("doc_id").alias("doc_b"), "gh")
    inter = (
        a.join(b, "gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "jaccard")
