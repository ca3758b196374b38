#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "deep": {"factor": 10, "value": N, "queries": {...}}}

The "deep" section re-times the same queries on a 10x key-shifted
upscale of the base tables (generated once into a cached dir). At
sf0.1 every query is dominated by the ~1 s plan/Arrow warmup floor,
so round-over-round deltas there are noise; the deep run is where
plan-quality regressions (extra shuffles, lost pushdowns, skew) are
actually visible. Set SPARK_GRAFT_SKIP_DEEP=1 to skip it.

Round-4 regression post-mortem (the "explain or erase" ask): BENCH_r04
inflated uniformly (+8-20% headline, deep q55 1.88x) on unchanged
query code. Two causes, both fixed in round 5 and confirmed erased by
re-measurement (headline 12.27 s -> ~6.3 s, deep q55 back under its
round-3 time): (1) every builder called spark.read.parquet for all 10
tables inside the timed region — a per-call JVM round-trip + footer
read (~0.8 s/query) that grew with table count and dominated the sf0.1
floor; io/tables.py now memoizes the scan DataFrames per (session,
dir), the catalog shape any engine would use. (2) the deep section was
single-run and executed after the flagship streaming bench, inheriting
JVM/GC state; deep is now min-of-2 and runs before flagship, and the
flagship query drains on an idle trigger before stop() so no
micro-batch aborts into the log. A round-over-round regression gate
(>1.5x per query vs the previous BENCH json) prints into the output so
a future silent inflation cannot land unexplained again.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import sys
import tempfile
import time

DEEP_FACTOR = int(os.environ.get("SPARK_GRAFT_DEEP_FACTOR", "10"))

# ---------------------------------------------------------------------------
# Timing action (round-8 measurement audit). Rounds 1-8 timed queries
# with `.count()`, which is WRONG as a benchmark action: under a pure
# row count Catalyst prunes every unreferenced column and ELIMINATES
# unique-key left joins, so expression-heavy stages silently dropped
# out of the measurement. Audited per bench query (optimized count
# plan vs full plan): q50_audio_decode lost its decode UDF entirely
# (1.4 s "count" vs 7.6 s real at sf0.1), q135_cdc_dedup lost both
# joins and all three CDC UDFs (0.2 s vs 47.9 s real), and
# q103/q149's members LEFT JOIN pair_stats — unique on the join key —
# was eliminated outright, so their soak history measured the k-means
# stage only, never the pair enumeration. All other bench queries'
# count plans matched their full plans (joins/scans/Python nodes).
# The fix: time a noop-sink write, which materializes every column of
# every row. Correctness was never affected (the driver and the parity
# suites execute full results); only wall-clock attribution was.
# `timing_action` is stamped into the output so the regression gate
# never compares across methodologies.
# ---------------------------------------------------------------------------

TIMING_ACTION = "noop_write"

# min-of-2 exists to defeat transient GC/OS noise bursts, which are a
# large FRACTION of sub-second runs and a few percent of minute-scale
# ones; above this cutoff a single run is the better budget trade
_MIN_OF_2_CUTOFF_S = 30.0


def _run_full(df) -> None:
    """Fully materialize the plan (all columns, all rows) without
    collecting — the benchmark timing action."""
    df.write.format("noop").mode("overwrite").save()

# key shifts per replica: keep every FK relationship intact
# (orders.o_custkey ↔ customer.c_custkey shift together; lineitem
# joins dims that are NOT replicated, so part/supp keys are unshifted)
_DEEP_SQL = {
    "lineitem": (
        "SELECT l_orderkey + r.r * 10000000 AS l_orderkey, l_partkey, "
        "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        "FROM src, range({f}) r(r)"
    ),
    "orders": (
        "SELECT o_orderkey + r.r * 10000000 AS o_orderkey, "
        "o_custkey + r.r * 10000000 AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority "
        "FROM src, range({f}) r(r)"
    ),
    "customer": (
        "SELECT c_custkey + r.r * 10000000 AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment FROM src, range({f}) r(r)"
    ),
    "events": (
        "SELECT event_id + r.r * 10000000 AS event_id, ts, "
        "user_id + r.r * 1000000 AS user_id, event_type, value, props "
        "FROM src, range({f}) r(r)"
    ),
    # per-replica suffix on EVERY word: within a replica the token
    # statistics are isomorphic to the base corpus (near-dup structure
    # preserved exactly), across replicas the token sets are disjoint
    # (shingle similarity ~0) — so the dedup workload scales linearly
    # (10x the original pair count). A trailing salt would leave
    # replicas near-duplicate (quadratic pair blowup); an interleaved
    # common token would make whole replicas self-similar (worse).
    "documents": (
        "SELECT doc_id + r.r * 1000000 AS doc_id, "
        "CASE WHEN r.r = 0 THEN text "
        "ELSE replace(text, ' ', cast(r.r AS VARCHAR) || ' ') END AS text, "
        "lang, source, n_chars FROM src, range({f}) r(r)"
    ),
    "embeddings": (
        "SELECT vec_id + r.r * 1000000 AS vec_id, embedding, label "
        "FROM src, range({f}) r(r)"
    ),
}

_COPY_TABLES = ("region", "nation", "supplier", "part")


def _deep_cache_key(sf_dir: str) -> str:
    """Identity of the base data: path + per-table (size, mtime). A
    changed base dir invalidates the cached upscale (round-4 nit: a
    stale _DONE marker would silently bench old data)."""
    parts = [os.path.abspath(sf_dir)]
    for name in sorted(os.listdir(sf_dir)):
        if name.endswith(".parquet"):
            st = os.stat(os.path.join(sf_dir, name))
            parts.append(f"{name}:{st.st_size}:{int(st.st_mtime)}")
    return "|".join(parts)


def _assert_upscale_id_bounds(sf_dir: str) -> None:
    """The replica shifts in _DEEP_SQL and ensure_recall_dir assume id
    headroom in the base corpus (vec_id/doc_id/user_id < 1e6,
    order/customer keys < 1e7); a bigger base would silently collide
    replica ids with base ids (round-9 advice). Assert the bound once
    per generation — cache hits skip it, generation is minutes anyway."""
    import duckdb

    checks = (
        ("embeddings", "vec_id", 1_000_000),
        ("documents", "doc_id", 1_000_000),
        ("events", "user_id", 1_000_000),
        ("events", "event_id", 10_000_000),
        ("orders", "o_orderkey", 10_000_000),
        ("orders", "o_custkey", 10_000_000),
        ("customer", "c_custkey", 10_000_000),
        ("lineitem", "l_orderkey", 10_000_000),
    )
    with contextlib.closing(duckdb.connect()) as con:
        for table, col, bound in checks:
            path = os.path.join(sf_dir, f"{table}.parquet")
            if not os.path.exists(path):
                continue
            mx = con.execute(f"SELECT max({col}) FROM '{path}'").fetchone()[0]
            if mx is not None and mx >= bound:
                # a hard error, not an assert: collided replica ids
                # silently corrupt the upscale, and asserts vanish
                # under python -O (round-10 advice)
                raise ValueError(
                    f"{table}.{col} max {mx} >= replica shift {bound}: the "
                    f"upscale would collide replica ids with base ids"
                )


def _prestage_tables(d: str) -> None:
    """Run the io/tables.py staging passes (µs timestamp cast,
    row-group re-chunk) for every table of a generated dir NOW, so the
    one-time staging cost lands in data-prep instead of inside the
    first timed run (min-of-2 absorbs it for short queries, but >30 s
    legs are single-run)."""
    from streamprocess_spark.io.tables import table_path
    from streamprocess_spark.schemas import TABLE_NAMES

    for name in TABLE_NAMES:
        if os.path.exists(os.path.join(d, f"{name}.parquet")):
            table_path(d, name)


def ensure_deep_dir(sf_dir: str, factor: int = DEEP_FACTOR) -> str:
    """Generate (once, cached) a factor-x upscale of the base tables."""
    import duckdb

    dst = os.environ.get(
        "SPARK_GRAFT_DEEP_DIR",
        os.path.join(tempfile.gettempdir(), f"spark_graft_deep_x{factor}"),
    )
    marker = os.path.join(dst, "_DONE")
    key = _deep_cache_key(sf_dir)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == key:
                _prestage_tables(dst)
                return dst
        shutil.rmtree(dst, ignore_errors=True)  # stale: regenerate
    _assert_upscale_id_bounds(sf_dir)
    os.makedirs(dst, exist_ok=True)
    for t in _COPY_TABLES:
        shutil.copy(
            os.path.join(sf_dir, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )
    con = duckdb.connect()
    for t, sql in _DEEP_SQL.items():
        src = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"COPY ({sql.format(f=factor).replace('src', repr(src))}) "
            f"TO '{os.path.join(dst, t + '.parquet')}' (FORMAT PARQUET)"
        )
    with open(marker, "w") as f:
        f.write(key)
    _prestage_tables(dst)
    return dst


# ---------------------------------------------------------------------------
# scale soak (round-6 verdict ask #1): the dedup/ANN family's "bucketed,
# never all-pairs" claims were plan-shape arguments; this measures them.
# Each query runs at deep x10 AND x100 and the x100/x10 runtime ratio is
# gated at SOAK_MAX_RATIO — near-linear (~10x work) must stay ~10x time;
# a quadratic (all-pairs) regression would show ~100x and flag.
# ---------------------------------------------------------------------------

SOAK_FACTOR = int(os.environ.get("SPARK_GRAFT_SOAK_FACTOR", "100"))
SOAK_MAX_RATIO = 15.0
SOAK_QUERIES = (
    "q45_minhash_lsh",
    "q149_semdedup_scale_auto",
    "q122_incremental_dedup",
    # bloom-prefiltered exact admission (round 8): linear by design —
    # 2 corpus scans, 0 corpus shuffles, index auto-sized to the corpus
    "q153_bloom_admission",
    # re-added late round 8 (see the q135 note below): x10 ~10-19 s,
    # x100 ~69 s, ratio ~3.6 once the fixture artifacts were fixed
    "q135_cdc_dedup",
    # round-10 verdict #5: the one dedup-family member with a
    # corpus-wide shuffle (gram-hash counts) — its x100 behavior was
    # the scale-credibility gap in the dedup story
    "q139_substring_spans",
    # round-11 verdict #3: the one dedup-family member with an
    # ITERATIVE corpus-wide stage (hash-min connected components);
    # convergence cost tracks duplicate-cluster diameter, which the
    # replica-heavy upscale makes adversarial. The _SOAK_EXTRA builder
    # records the per-leg convergence-round count (cc_rounds).
    "q86_dup_clusters",
)
# Dropped from the soak by the round-8 timing-action audit (see
# TIMING_ACTION):
#   - q103_semdedup: fixed k=8 means cluster size ~ N/8, so the pair
#     stage is ~N^2/16 dots. Even on the Arrow block pair scorer
#     (_cluster_pairs) it measures 51 s at x10 and ~100x that at
#     x100 (timed out past 7 min). That quadratic-at-fixed-capacity
#     blowup is REAL and is precisely
#     the degradation SemDeDup's paper configuration has at growing
#     corpus sizes — the measured argument FOR q149, whose auto-bits
#     variant keeps cluster capacity tracking the corpus and stays in
#     the soak. (q103 stays correctness-checked at every SF by the
#     oracle suites, which execute full results.)
#   - q135_cdc_dedup was ALSO dropped here ("~17 min at x100") and that
#     reading is withdrawn as misdiagnosed: it measured two FIXTURE
#     artifacts, not the operator. (1) the synthetic payload suffix
#     grew linearly with doc_id, so upscaled corpora (deep/soak ids
#     reach 10^7-10^8) ballooned to ~MB payloads — total input bytes
#     grew quadratically with corpus size (now bounded, llm_pipeline
#     _synth_blob_udf); (2) the single-row-group fixture parquet pinned
#     the whole map stage to one core (now re-chunked by the
#     io/tables.py staging layer). With both fixed, honest full-row
#     timing measures x10 ~10-19 s -> x100 ~69 s (ratio ~3.6) and q135
#     is back in the soak above.


def _soak_semdedup_scaled(spark, sf_dir: str):
    """q149's operator at its DEPLOYMENT configuration: coarse-bit
    width sized to the corpus (bits ≈ log2(N / (target·k)), target
    ~250 vectors per cluster at k=8 per group), the knob a real
    deployment turns as data grows. The registered q149 pins bits=2
    for oracle determinism at sf0.01; running THAT at x100 would
    reproduce exactly the fixed-capacity degradation q103 measures.
    Side by side in the soak output: q103 (fixed k=8) shows the
    super-linear fixed-capacity curve, this entry shows the same
    semantics staying near-linear when capacity tracks the corpus."""
    import math

    import duckdb

    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators.similarity import semdedup_scaled

    n = duckdb.sql(
        f"SELECT count(*) FROM "
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}'"
    ).fetchone()[0]
    bits = max(1, round(math.log2(max(2.0, n / 2000.0))))
    print(f"# soak semdedup_scale: N={n} -> bits={bits} "
          f"({1 << bits} groups x k=8)", file=sys.stderr)
    emb = load_tables(spark, sf_dir)["embeddings"]
    return semdedup_scaled(emb, bits=bits, k=8, n_iter=2, dim=64,
                           threshold=0.35)


# per-leg side-channel notes from _SOAK_EXTRA builders (cleared per
# soak entry by _bench_soak, appended once per builder invocation)
_SOAK_LEG_NOTES: dict[str, list] = {}


def _soak_dup_clusters(spark, sf_dir: str):
    """q86's exact operator (minhash candidate pairs -> hash-min
    connected components) with the convergence-round count recorded
    per invocation: rounds needed = component diameter, the quantity
    the replica-heavy upscale stresses (round-11 verdict #3)."""
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators import dedup as D

    docs = load_tables(spark, sf_dir)["documents"]
    pairs = D.minhash_candidates(docs, "doc_id", "text").select(
        "doc_a", "doc_b"
    )
    stats: dict = {}
    out = D.connected_components(pairs, stats=stats)
    _SOAK_LEG_NOTES.setdefault("q86_dup_clusters", []).append(
        stats.get("rounds")
    )
    print(f"# soak q86 convergence rounds: {stats.get('rounds')}",
          file=sys.stderr)
    return out


# soak entries that are bench-level builders rather than registered
# queries (deployment-parameterized variants of registered operators)
_SOAK_EXTRA = {
    "q149_semdedup_scale_auto": _soak_semdedup_scaled,
    # same operator as the registered q86, via the stats-recording
    # wrapper above
    "q86_dup_clusters": _soak_dup_clusters,
}


def ensure_soak_dir(sf_dir: str, factor: int = SOAK_FACTOR) -> str:
    """x{factor} upscale of ONLY documents + embeddings (the soak
    queries' inputs), other tables copied x1 — load_tables opens every
    table's footer eagerly, so all 10 files must exist, but upscaling
    lineitem x100 would cost ~1 GB of disk for tables the soak never
    scans."""
    import duckdb

    dst = os.environ.get(
        "SPARK_GRAFT_SOAK_DIR",
        os.path.join(tempfile.gettempdir(), f"spark_graft_soak_x{factor}"),
    )
    marker = os.path.join(dst, "_DONE")
    key = _deep_cache_key(sf_dir)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == key:
                _prestage_tables(dst)
                return dst
        shutil.rmtree(dst, ignore_errors=True)
    _assert_upscale_id_bounds(sf_dir)
    os.makedirs(dst, exist_ok=True)
    upscaled = ("documents", "embeddings")
    for name in os.listdir(sf_dir):
        if name.endswith(".parquet") \
                and name.removesuffix(".parquet") not in upscaled:
            shutil.copy(os.path.join(sf_dir, name), os.path.join(dst, name))
    con = duckdb.connect()
    for t in upscaled:
        src = os.path.join(sf_dir, f"{t}.parquet")
        sql = _DEEP_SQL[t].format(f=factor).replace("src", repr(src))
        con.execute(
            f"COPY ({sql}) TO '{os.path.join(dst, t + '.parquet')}' "
            f"(FORMAT PARQUET)"
        )
    with open(marker, "w") as f:
        f.write(key)
    _prestage_tables(dst)
    return dst


def _bench_soak(spark, sf_dir: str) -> dict:
    from streamprocess_spark.plans import QUERIES

    lo_dir = ensure_deep_dir(sf_dir)            # x10
    t0 = time.perf_counter()
    hi_dir = ensure_soak_dir(sf_dir)            # x100
    print(f"# soak x{SOAK_FACTOR} data ready in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    out: dict[str, dict] = {}
    for name in SOAK_QUERIES:
        builder = _SOAK_EXTRA.get(name) or (
            QUERIES[name].builder if name in QUERIES else None
        )
        if builder is None:
            continue
        _SOAK_LEG_NOTES.pop(name, None)
        lo = float("inf")
        for _ in range(2):   # min-of-2 at x10: the short leg is the
            t0 = time.perf_counter()           # noise-sensitive one
            _run_full(builder(spark, lo_dir))
            lo = min(lo, time.perf_counter() - t0)
            if lo > _MIN_OF_2_CUTOFF_S:
                break        # same >30s single-run rule as headline
        t0 = time.perf_counter()
        hi_df = builder(spark, hi_dir)
        _run_full(hi_df)
        hi = time.perf_counter() - t0
        # Round-9 verdict #6 (soak variance): the x100 leg was always
        # single-run on a "minute-scale" assumption, but several legs
        # finish in seconds (q153 ~3 s) where transient noise is a
        # large fraction of the reading — q149_auto's recorded ratio
        # ranged 1.0-7.2x across round-8 runs on unchanged code. Apply
        # the same >30s single-run rule as everywhere else: a hi leg
        # that measured under the cutoff gets a second pass, min wins.
        if hi < _MIN_OF_2_CUTOFF_S:
            t0 = time.perf_counter()
            _run_full(builder(spark, hi_dir))
            hi = min(hi, time.perf_counter() - t0)
        rows_hi = hi_df.count()                # display-only, untimed
        ratio = hi / lo
        out[name] = {
            "lo_sec": round(lo, 4), "hi_sec": round(hi, 4),
            "rows_hi": int(rows_hi), "ratio": round(ratio, 2),
        }
        notes = _SOAK_LEG_NOTES.pop(name, None)
        if notes:
            # one entry per builder invocation, in run order (x10
            # passes first, then x100)
            out[name]["cc_rounds"] = notes
        print(f"# soak {name}: x{DEEP_FACTOR} {lo:.3f}s -> "
              f"x{SOAK_FACTOR} {hi:.3f}s (ratio {ratio:.1f}x, "
              f"{rows_hi} rows)", file=sys.stderr)
    return {
        "factor_lo": DEEP_FACTOR, "factor_hi": SOAK_FACTOR,
        "max_ratio": SOAK_MAX_RATIO, "queries": out,
    }


# ---------------------------------------------------------------------------
# ANN recall at scale (round-7 verdict #6): runtime scaling is soak-
# measured, but result QUALITY under scale was only tested at sf0.001.
# recall@5 vs the exact top-k (q48 ground truth) at the bench SF and at
# a x10 corpus, gated at per-query floors. Floors sit ~15-25% below the
# measured readings (recall at a fixed corpus is fully deterministic —
# md5-seeded planes, fixed-point scoring, id tie-breaks — so headroom
# beyond that only hides quality regressions).
#
# Round-9 verdict #1: the x10 leg previously reused ensure_deep_dir,
# whose upscale REPLICATES embedding values — each query's top-5 was
# its own exact replicas and every correctly-bucketed index read
# 0.94-1.0, so the leg caught bucketing breakage but never quality
# degradation. The recall x10 leg now has its own corpus
# (ensure_recall_dir): replicas carry a deterministic per-(vector,
# replica, dim) hash jitter of +-0.24 that lands them at cosine ~0.67
# to their original — wide enough (48 deg) that sign-LSH planes split
# them and PQ/IVF quantization error is comparable to the gap, so
# recovering them exercises the multi-table/nprobe machinery for real
# (measured: q49 0.88, q73 1.00, q99 0.92, q111 0.46 vs the uniform
# ~1.0 before). The deep TIMING dir keeps exact replication on
# purpose: identical values = maximal duplicate multiplicity, the most
# adversarial shape for the dedup soak's pair stages, and the
# documents upscale there is what keeps the MinHash workload linear.
# ---------------------------------------------------------------------------

ANN_RECALL_FLOORS = {
    # per-leg floors: sf unchanged from round 8; x10 floors set 15-25%
    # below the jittered-corpus measurements above
    "sf": {
        "q49_ann_lsh_topk": 0.6,
        "q73_ann_ivf_topk": 0.9,
        "q99_ann_ivf_trained": 0.7,
        # round-10 verdict #3: the ADC-top-R exact-rescore tail. The
        # round-11 depth sweep (table at llm_pipeline._PQ_RESCORE)
        # showed cost flat in R, so R=200 ships: sf leg 0.22 -> 0.82,
        # deep 0.46 -> 0.90 at ~the pure-ADC runtime; floors re-set
        # ~15% below the new readings
        "q111_pq_ann": 0.7,
    },
    "deep": {
        "q49_ann_lsh_topk": 0.7,
        "q73_ann_ivf_topk": 0.9,
        "q99_ann_ivf_trained": 0.75,
        "q111_pq_ann": 0.8,
    },
}

# jitter amplitude in 1e-4 units: +-0.24 per component. Embedding
# components are ~N(0, 0.1) over 64 dims (|x| ~ 0.8), so the replica
# cosine lands at |x|/sqrt(|x|^2+|j|^2) ~ 0.67 — far above the 0.35
# dedup threshold (replicas stay near-dups for any consumer) but wide
# enough that ANN bucket assignment genuinely has to work.
_RECALL_JITTER_AMP = 2400


def ensure_recall_dir(sf_dir: str, factor: int = DEEP_FACTOR) -> str:
    """x{factor} corpus for the ANN-recall leg: embeddings upscaled
    with the deterministic hash jitter above; every other table copied
    from the deep dir (the recall queries only scan embeddings, but
    load_tables opens all footers). The ground-truth pass (exact q48)
    runs on this same dir, so exact and approx see identical bytes."""
    import duckdb

    dst = os.environ.get(
        "SPARK_GRAFT_RECALL_DIR",
        os.path.join(tempfile.gettempdir(),
                     f"spark_graft_recall_x{factor}"),
    )
    marker = os.path.join(dst, "_DONE")
    key = _deep_cache_key(sf_dir) + f"|jitter={_RECALL_JITTER_AMP}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == key:
                _prestage_tables(dst)
                return dst
        shutil.rmtree(dst, ignore_errors=True)
    _assert_upscale_id_bounds(sf_dir)
    deep = ensure_deep_dir(sf_dir, factor)
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(deep):
        if name.endswith(".parquet") and name != "embeddings.parquet":
            shutil.copy(os.path.join(deep, name), os.path.join(dst, name))
    src = os.path.join(sf_dir, "embeddings.parquet")
    amp = _RECALL_JITTER_AMP
    sql = (
        f"SELECT vec_id + r.r * 1000000 AS vec_id, "
        f"CASE WHEN r.r = 0 THEN embedding ELSE "
        f"list_transform(range(1, len(embedding) + 1), i -> "
        f"(embedding[i] + ((hash(vec_id * 64 + i + r.r * 7919) "
        f"% {2 * amp + 1})::BIGINT - {amp}) * 0.0001)::FLOAT) "
        f"END AS embedding, label "
        f"FROM {src!r}, range({factor}) r(r)"
    )
    duckdb.connect().execute(
        f"COPY ({sql}) TO '{os.path.join(dst, 'embeddings.parquet')}' "
        f"(FORMAT PARQUET)"
    )
    with open(marker, "w") as f:
        f.write(key)
    _prestage_tables(dst)
    return dst


def _bench_ann_recall(spark, sf_dir: str) -> dict:
    from streamprocess_spark.plans import QUERIES

    legs = {"sf": sf_dir}
    if not os.environ.get("SPARK_GRAFT_SKIP_DEEP"):
        legs["deep"] = ensure_recall_dir(sf_dir)
    out: dict[str, dict] = {}
    for leg, d in legs.items():
        exact = {
            (r["qid"], r["cid"])
            for r in QUERIES["q48_embedding_topk"].builder(spark, d).collect()
        }
        out[leg] = {}
        for name, floor in ANN_RECALL_FLOORS[leg].items():
            approx = {
                (r["qid"], r["cid"])
                for r in QUERIES[name].builder(spark, d).collect()
            }
            rec = round(len(exact & approx) / max(len(exact), 1), 4)
            out[leg][name] = {"recall_at_5": rec, "floor": floor}
            print(f"# ann recall[{leg}] {name}: {rec} (floor {floor})",
                  file=sys.stderr)
    return out


# ---------------------------------------------------------------------------
# end-to-end corpus-curation DAG (round-7 verdict #5): the pipeline
# pieces are individually green; this times them as ONE composed job
# (q150: WARC source -> HTML->text -> dedup -> contamination ->
# admission -> splits through txlog stage tables) and replays the final
# admitted-corpus verdict counts in DuckDB.
# ---------------------------------------------------------------------------


def _bench_curation(spark, sf_dir: str) -> dict:
    import duckdb

    from streamprocess_spark.plans import QUERIES

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
    ).fetchone()[0]
    el, rows = float("inf"), None
    for _ in range(2):     # min-of-2, the headline policy
        t0 = time.perf_counter()
        rows = sorted(
            (r["verdict"], r["split"], r["n_docs"], r["membership_sum"])
            for r in QUERIES["q150_curation_dag"].builder(spark, sf_dir)
            .collect()
        )
        el = min(el, time.perf_counter() - t0)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    oracle_rows = sorted(
        tuple(r)
        for r in con.execute(
            QUERIES["q150_curation_dag"].oracle_sql()
        ).fetchall()
    )
    verified = rows == oracle_rows
    out = {
        "n_docs": int(n_docs),
        "cells": len(rows),
        "admitted_docs": int(sum(r[2] for r in rows)),
        "value": round(el, 4),
        "docs_per_sec": round(n_docs / el, 1),
        "verified": bool(verified),
    }
    print(
        f"# curation DAG: {el:.3f}s ({out['docs_per_sec']} docs/s, "
        f"{out['admitted_docs']}/{n_docs} admitted, "
        f"replay {'OK' if verified else 'MISMATCH'})",
        file=sys.stderr,
    )
    return out


N_STREAMS = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_STREAMS", "100"))
SCALE_STREAMS = int(
    os.environ.get("SPARK_GRAFT_FLAGSHIP_SCALE_STREAMS", "1000")
)


def _flagship_once(spark, chunks, label: str, n_runs: int = 2) -> dict:
    """Enqueue one chunk workload and time the queue -> sessionizer ->
    result-store pipeline end to end (min of n_runs fresh runs)."""
    from pyspark.sql import functions as F

    from streamprocess_spark.io.queue_source import (
        enqueue_job,
        register_queue_source,
    )
    from streamprocess_spark.io.result_sink import register_result_sink
    from streamprocess_spark.streaming.sessionizer import (
        DEFAULT_CONFIG,
        sessionize_batch,
        sessionize_stream,
    )

    qdir = tempfile.mkdtemp(prefix="spbenchq_")
    expected_n = sessionize_batch(chunks, DEFAULT_CONFIG).count()

    prios = ("realtime", "high", "normal", "low")
    n_chunks = 0
    for row in chunks.orderBy("session_id", "seq").toLocalIterator():
        n_chunks += 1
        enqueue_job(
            qdir,
            prios[int(row["session_id"]) % 4],
            {
                "job_id": f"{row['session_id']}-{row['seq']}",
                "type": "stt_chunk",
                "payload": {
                    "seq": row["seq"],
                    "offset_ms": row["offset_ms"],
                    "is_final": row["is_final"],
                    "samples": [float(x) for x in row["samples"]],
                },
            },
        )

    register_queue_source(spark)
    register_result_sink(spark)
    payload_schema = (
        "seq long, offset_ms long, is_final boolean, samples array<float>"
    )
    jobs = spark.readStream.format("priority_queue").option("path", qdir).load()
    chunk_stream = (
        jobs.filter(F.col("type") == "stt_chunk")
        .select(
            F.split(F.col("job_id"), "-")[0].alias("session_id"),
            F.from_json("payload", payload_schema).alias("p"),
        )
        .select("session_id", "p.seq", "p.offset_ms", "p.is_final", "p.samples")
    )
    segments = sessionize_stream(chunk_stream, DEFAULT_CONFIG).select(
        F.concat_ws("_", "session_id", "start_offset_ms").alias("job_id"),
        F.to_json(F.struct("segment_idx", "n_samples", "trigger")).alias(
            "payload"
        ),
    )

    def _one_run() -> tuple[float, int, int]:
        # Fresh result dir + checkpoint per run; the queue log is
        # append-only (offsets live in the checkpoint), so each run
        # replays the identical enqueued workload from offset zero.
        rdir = tempfile.mkdtemp(prefix="spbenchr_")
        ckpt = tempfile.mkdtemp(prefix="spbenchck_")
        t0 = time.perf_counter()
        query = (
            segments.writeStream.format("result_store")
            .option("path", rdir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 300
            delivered = 0
            while time.time() < deadline:
                delivered = sum(
                    1 for f in os.listdir(rdir) if f.endswith(".json")
                )
                if delivered >= expected_n:
                    break
                # 50 ms poll (round 13; was 200 ms): the poll cadence is
                # measurement-completion latency, not pipeline work — a
                # coarse poll adds up to its full period to every leg's
                # wall reading. listdir of a few-thousand-file dir is
                # ~1 ms, so the finer poll costs nothing measurable.
                time.sleep(0.05)
            el = time.perf_counter() - t0
            # drain before stop (outside the timed region): stopping
            # while a 200ms trigger is mid-flight aborts its micro-batch
            # commit and leaves ERROR lines in an otherwise-clean bench
            # (round-4 verdict). processAllAvailable() is NOT usable
            # here — the sessionizer's processing-time idle-timeout (T8)
            # keeps constructing timeout-only micro-batches, so the
            # engine never reports noNewData (verified: epochs advance
            # ~1.6s apart with zero input forever). Instead wait for an
            # IDLE completed trigger (numInputRows == 0) and stop in the
            # inter-trigger gap, so no batch is mid-commit when stop()
            # lands.
            drain_deadline = time.time() + 60
            batches = 0
            while time.time() < drain_deadline:
                lp = query.lastProgress
                if lp is not None:
                    batches = int(lp.get("batchId", -1)) + 1
                    if int(lp.get("numInputRows", -1)) == 0:
                        break
                time.sleep(0.05)
        finally:
            query.stop()
        for d in (rdir, ckpt):
            shutil.rmtree(d, ignore_errors=True)
        return el, delivered, batches

    # min of 2, same policy as every other bench section (round-5
    # verdict #3: the single-run flagship slid 10% round-over-round on
    # unchanged code — one-off scheduler/GC jitter lands straight in
    # the round delta unless the section is repeated)
    el, delivered = float("inf"), 0
    runs: list[float] = []
    nb: list[int] = []
    for _ in range(n_runs):
        el_i, delivered_i, batches_i = _one_run()
        runs.append(round(el_i, 2))
        nb.append(batches_i)
        if el_i < el:
            el, delivered = el_i, delivered_i
    n_streams = chunks.select("session_id").distinct().count()
    out = {
        "streams": int(n_streams),
        "input_chunks": int(n_chunks),
        "segments": int(delivered),
        "expected_segments": int(expected_n),
        "value": round(el, 4),
        "chunks_per_sec": round(n_chunks / el, 1),
        # round-9 verdict #1 (self-adjudicating artifact): every pass's
        # wall time + its micro-batch count. Two slow passes with
        # unchanged batch counts = host noise; divergent batch counts
        # or a one-sided slowdown = investigate.
        "runs": runs,
        "nb": nb,
    }
    print(
        f"# flagship[{label}] queue->sessionizer->sink: {el:.3f}s "
        f"({out['chunks_per_sec']} chunks/s, "
        f"{delivered}/{expected_n} segments, {n_streams} streams)",
        file=sys.stderr,
    )
    shutil.rmtree(qdir, ignore_errors=True)
    return out


def _bench_flagship(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.streaming.sessionizer import (
        DEFAULT_CONFIG,
        chunks_from_events,
    )

    ev = load_tables(spark, sf_dir)["events"]
    chunks = chunks_from_events(ev, DEFAULT_CONFIG, max_users=N_STREAMS)
    out = _flagship_once(spark, chunks, "even")

    # Skewed leg (round-6 verdict ask #6): real session traffic is
    # Zipfian, not even. Merge ~30% of the users into one hot session
    # BEFORE chunks_from_events so the hot stream gets consistent
    # seq/offset numbering, then run the identical pipeline. Per-key
    # sessionizer state is bounded (segments emit and are discarded),
    # so the hot key should cost only its share — gated at within 2x
    # of the even figure in _regression_gate.
    ev_skew = ev.filter(F.col("user_id") < N_STREAMS).withColumn(
        "user_id",
        F.when(F.col("user_id") % 10 < 3, F.lit(0)).otherwise(
            F.col("user_id")
        ),
    )
    chunks_skew = chunks_from_events(ev_skew, DEFAULT_CONFIG)
    out["skew"] = _flagship_once(spark, chunks_skew, "skew")

    # 1,000-stream leg (round-7 verdict #8): the state-store growth
    # story — bounded per-key state, T8 reaping — exercised at 10x the
    # stream count. Round 11: min-of-2 like the other legs — the legs
    # were single-run when they took minutes, but post-daemon they run
    # ~7-8 s, and the scale_rocksdb/scale provider-parity gate divides
    # two single-run readings, whose independent noise produced a
    # spurious 0.48 ratio flag on an untouched tree (two same-day runs
    # read 9.6k/9.0k green). Min-of-2 on BOTH sides stabilizes the
    # ratio for ~15 s of bench time.
    chunks_scale = chunks_from_events(
        ev, DEFAULT_CONFIG, max_users=SCALE_STREAMS
    )
    out["scale"] = _flagship_once(
        spark, chunks_scale, f"scale-{SCALE_STREAMS}"
    )

    # RocksDB state-store leg (round-9 verdict #5): the even/skew/scale
    # legs run on the default HDFS-backed in-memory provider, but a
    # 100 TB deployment with millions of live sessions keeps state in
    # RocksDBStateStoreProvider (spillable, incremental-checkpointed).
    # Re-run the even workload with RocksDB enabled: results must be
    # provider-invariant (segments == expected is asserted by the same
    # delivery loop) and throughput is gated within 2x of the even leg
    # in _regression_gate, alongside skew/scale.
    # Round-13 (round-12 verdict #1): the RocksDB legs run the engine's
    # RocksDB deployment profile — provider + changelog checkpointing
    # (see session.rocksdb_state_conf for the measured attribution:
    # full-snapshot zip+sync dominated every micro-batch commit).
    # Results are provider-invariant (segments == expected asserted by
    # the delivery loop, same as every leg).
    from streamprocess_spark.session import rocksdb_state_conf

    rocks_conf = rocksdb_state_conf()
    saved_rocks: dict[str, str | None] = {}
    for ck, cv in rocks_conf.items():
        try:
            saved_rocks[ck] = spark.conf.get(ck)
        except Exception:
            saved_rocks[ck] = None
        spark.conf.set(ck, cv)
    try:
        out["rocksdb"] = _flagship_once(spark, chunks, "rocksdb")
        # Round-10 verdict #3: run RocksDB where it matters — the
        # 1,000-stream leg, the shape the provider exists for (millions
        # of live keys at 100 TB). Segments == expected is asserted by
        # the same delivery loop; throughput gates within 2x of the
        # IN-MEMORY scale leg (not the even leg) in _regression_gate.
        out["scale_rocksdb"] = _flagship_once(
            spark, chunks_scale, f"scale-{SCALE_STREAMS}-rocksdb",
        )
    finally:
        for ck, cv in saved_rocks.items():
            if cv is not None:
                spark.conf.set(ck, cv)
            else:
                spark.conf.unset(ck)

    # Local-checkpoint deployment profile A/B (round-10 verdict #4):
    # the round-10 profile measured ~0.5 s/trigger of local-only
    # checkpoint overhead (FileContext readlink forks + 4.1 checksum
    # sidecars, absent libhadoop). The opt-in profile
    # (session.local_checkpoint_profile_conf, env
    # SPARK_GRAFT_LOCAL_CHECKPOINT_PROFILE) trades HDFS atomic-rename +
    # corruption detection for those file ops — right for local/bench
    # hosts, wrong for HDFS. Record BOTH sides every round: which
    # profile the session ran (`checkpoint_profile`), plus an even-leg
    # rerun under the OTHER profile (`local_ckpt` when the session is
    # default, `default_ckpt` otherwise). Segments are asserted == by
    # the same delivery loop, so the row is also provider-invariance
    # evidence.
    from streamprocess_spark.session import (
        LOCAL_CHECKPOINT_PROFILE_ENV,
        _LOCAL_CHECKPOINT_CONF,
    )

    session_is_local = bool(os.environ.get(LOCAL_CHECKPOINT_PROFILE_ENV))
    out["checkpoint_profile"] = "local" if session_is_local else "default"
    ab_leg = "default_ckpt" if session_is_local else "local_ckpt"
    saved: dict[str, str | None] = {}
    for ck, cv in _LOCAL_CHECKPOINT_CONF.items():
        try:
            saved[ck] = spark.conf.get(ck)
        except Exception:
            saved[ck] = None
        if session_is_local:
            spark.conf.unset(ck)  # A/B leg = Spark defaults
        else:
            spark.conf.set(ck, cv)
    try:
        out[ab_leg] = _flagship_once(spark, chunks, ab_leg)
    finally:
        for ck, cv in saved.items():
            if cv is not None:
                spark.conf.set(ck, cv)
            else:
                spark.conf.unset(ck)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from streamprocess_spark import get_spark
    from streamprocess_spark.plans import QUERIES
    from streamprocess_spark.plans.registry import _ensure_loaded

    _ensure_loaded()
    spark = get_spark(app_name="streamprocess-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_names = [n for n, s in sorted(QUERIES.items()) if s.bench]
    timings: dict[str, float] = {}

    # warm the JVM + staged events copy once (not counted)
    _run_full(QUERIES[bench_names[0]].builder(spark, sf_dir))

    # min of 2 INTERLEAVED passes (all queries once, then all again):
    # back-to-back repeats of one query share any transient GC/OS noise
    # burst, which defeats the min; a full second pass decorrelates the
    # two samples (round-6 observation: adjacent min-of-2 still showed
    # a one-off 1.66x on an unchanged query; interleaved re-run did not)
    best: dict[str, float] = {n: float("inf") for n in bench_names}
    rows_of: dict[str, int] = {}
    last_df: dict[str, object] = {}
    for _pass in range(2):
        for name in bench_names:
            if _pass and best[name] > _MIN_OF_2_CUTOFF_S:
                continue  # >30s runs: warmup noise is a few %, one run
            t0 = time.perf_counter()
            last_df[name] = QUERIES[name].builder(spark, sf_dir)
            _run_full(last_df[name])
            best[name] = min(best[name], time.perf_counter() - t0)
    for name in bench_names:  # row counts are display-only, untimed
        rows_of[name] = last_df[name].count()
    total = 0.0
    for name in bench_names:
        timings[name] = round(best[name], 4)
        total += best[name]
        print(f"# {name}: {best[name]:.3f}s ({rows_of[name]} rows)",
              file=sys.stderr)

    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(total, 4),
        "unit": "sec",
        "timing_action": TIMING_ACTION,
        "queries": timings,
    }
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    result["sf"] = float(sf) if sf else None

    # streaming throughput: full events replay through the watermarked
    # tumbling-window aggregation (micro-batched availableNow run to a
    # converged sink) — the §6 "streaming" harness shape, reported as
    # end-to-end rows/sec of the stateful pipeline
    if "stream_tumbling_window" in QUERIES:
        import duckdb

        n_events = duckdb.sql(
            f"SELECT count(*) FROM '{os.path.join(sf_dir, 'events.parquet')}'"
        ).fetchone()[0]
        # min of 2, same policy as the headline loop: each run is a
        # fresh availableNow stream + checkpoint, so a one-off fs/GC
        # stall otherwise lands directly in the round-over-round delta
        from streamprocess_spark.streaming import core as _score

        el, out_rows = float("inf"), 0
        s_runs: list[float] = []
        s_nb: list[int] = []
        for _ in range(2):
            t0 = time.perf_counter()
            out_rows = (
                QUERIES["stream_tumbling_window"].builder(spark, sf_dir).count()
            )
            el_i = time.perf_counter() - t0
            s_runs.append(round(el_i, 2))
            s_nb.append(int(_score.LAST_RUN.get("batches", 0)))
            el = min(el, el_i)
        result_stream = {
            "input_rows": int(n_events),
            "output_rows": int(out_rows),
            "value": round(el, 4),
            "rows_per_sec": round(n_events / el, 1),
            # both pass timings + per-pass micro-batch counts (round-9
            # verdict #1): the r09 flag on this very metric took a full
            # independent re-measure to adjudicate as host noise
            "runs": s_runs,
            "nb": s_nb,
        }
        print(
            f"# streaming replay: {el:.3f}s "
            f"({result_stream['rows_per_sec']} rows/s)",
            file=sys.stderr,
        )
    else:
        result_stream = None

    # deep runs BEFORE the flagship streaming section (round-4 lesson:
    # deep inherited the flagship's JVM heap/GC state and, single-run,
    # recorded a phantom 1.9x "regression" on unchanged code)
    if not os.environ.get("SPARK_GRAFT_SKIP_DEEP"):
        t0 = time.perf_counter()
        deep_dir = ensure_deep_dir(sf_dir)
        gen_s = time.perf_counter() - t0
        print(f"# deep x{DEEP_FACTOR} data ready in {gen_s:.1f}s", file=sys.stderr)
        deep_timings: dict[str, float] = {}
        # min of 2 interleaved passes, same rationale as the headline loop
        deep_best: dict[str, float] = {n: float("inf") for n in bench_names}
        deep_rows: dict[str, int] = {}
        deep_df: dict[str, object] = {}
        for _pass in range(2):
            for name in bench_names:
                if _pass and deep_best[name] > _MIN_OF_2_CUTOFF_S:
                    continue  # same >30s single-run rule as headline
                t0 = time.perf_counter()
                deep_df[name] = QUERIES[name].builder(spark, deep_dir)
                _run_full(deep_df[name])
                deep_best[name] = min(
                    deep_best[name], time.perf_counter() - t0
                )
        for name in bench_names:  # row counts are display-only, untimed
            deep_rows[name] = deep_df[name].count()
        deep_total = 0.0
        for name in bench_names:
            deep_timings[name] = round(deep_best[name], 4)
            deep_total += deep_best[name]
            print(f"# deep {name}: {deep_best[name]:.3f}s "
                  f"({deep_rows[name]} rows)", file=sys.stderr)
        result["deep"] = {
            "factor": DEEP_FACTOR,
            "value": round(deep_total, 4),
            "queries": deep_timings,
        }

    # ANN result quality at scale (round-7 verdict #6)
    if not os.environ.get("SPARK_GRAFT_SKIP_ANN_RECALL"):
        result["ann_recall"] = _bench_ann_recall(spark, sf_dir)

    # end-to-end corpus-curation DAG (round-7 verdict #5)
    if not os.environ.get("SPARK_GRAFT_SKIP_CURATION"):
        result["curation"] = _bench_curation(spark, sf_dir)

    # flagship stateful path: priority-queue DataSource -> sessionizer
    # (applyInPandasWithState) -> result-store sink, the reference's
    # 100-concurrent-streams serving shape (README.md:34). Reported as
    # end-to-end chunk rows/sec from stream start to full delivery of
    # every expected segment (expected set = the batch sessionizer on
    # identical chunks; enqueue is producer-side setup, not measured).
    # Runs LAST so its heap churn cannot contaminate the query timings.
    if not os.environ.get("SPARK_GRAFT_SKIP_FLAGSHIP"):
        result["flagship"] = _bench_flagship(spark, sf_dir)

    # scale soak: dedup/ANN family at x10 vs x100 — measured evidence
    # for the near-linear claims. Runs LAST: its x100 legs churn the
    # heap hard, and the soak metric is a ratio of two runs in the
    # same JVM state, so ordering cannot bias it the way it would the
    # absolute flagship/headline figures (first measured run: flagship
    # dropped 16% when the soak preceded it).
    if not os.environ.get("SPARK_GRAFT_SKIP_SOAK"):
        result["soak"] = _bench_soak(spark, sf_dir)

    if result_stream is not None:
        result["streaming"] = result_stream

    result["regression_gate"] = _regression_gate(result)
    # Targeted noise-rejection retry (round-6 observation: this host
    # shows run-level noise bursts — unrelated, unchanged queries
    # inflate 1.5-2x together in one bench process and measure clean in
    # the next). A per-query flag gets up to two fresh re-measurements;
    # the min stands. A REAL regression re-measures as slow and keeps
    # its flag; a burst artifact clears. Throughput sections are not
    # retried (a full flagship/streaming rerun is not noise-shaped).
    per_query = [k for k in result["regression_gate"]["flagged"]
                 if not k.startswith(("flagship", "streaming:", "soak:",
                                      "curation:", "ann_recall:"))]
    retried: dict[str, dict] = {}
    if per_query:
        deep_dir_r = None if os.environ.get("SPARK_GRAFT_SKIP_DEEP") \
            else ensure_deep_dir(sf_dir)
        # Round-13 (round-12 verdict #6, additive-only): retries are
        # INTERLEAVED — one pass over every flagged query, then a
        # second — instead of 2 back-to-back runs per query, so a
        # transient host burst cannot poison both samples of one query
        # (the same rationale as the headline loop's interleaving).
        # Each pass additionally times one fixed cheap REFERENCE query
        # (untouched code, sub-second): if the reference also reads
        # slow, the flag window was host weather — recorded under
        # retried["_ref"], never used in any gate decision.
        resolved: list[tuple[str, str, str, str]] = []
        for key in per_query:
            if key.startswith("deep:"):
                section, q, tdir = "deep", key[5:], deep_dir_r
            else:
                section, q, tdir = "queries", key, sf_dir
            if tdir is None:
                continue
            resolved.append((key, section, q, tdir))
        firsts: dict[str, float] = {}
        bests: dict[str, float] = {}
        for key, section, q, tdir in resolved:
            target = result[section]["queries"] if section == "deep" \
                else result["queries"]
            firsts[key] = target[q]
            bests[key] = target[q]
        ref_name = "q55_ocr_lines" if "q55_ocr_lines" in QUERIES \
            else bench_names[0]
        ref_runs: list[float] = []
        for _pass in range(2):
            for key, section, q, tdir in resolved:
                t0 = time.perf_counter()
                _run_full(QUERIES[q].builder(spark, tdir))
                bests[key] = min(bests[key], time.perf_counter() - t0)
            t0 = time.perf_counter()
            _run_full(QUERIES[ref_name].builder(spark, sf_dir))
            ref_runs.append(round(time.perf_counter() - t0, 4))
        for key, section, q, tdir in resolved:
            target = result[section]["queries"] if section == "deep" \
                else result["queries"]
            best = bests[key]
            print(f"# gate retry {key}: {firsts[key]:.3f}s -> {best:.3f}s",
                  file=sys.stderr)
            # round-6 verdict #1: the retry must not erase the flagged
            # measurement — record both so a flagged-then-cleared query
            # is machine-readable round-over-round
            retried[key] = {"first": firsts[key], "retry": round(best, 4)}
            target[q] = round(best, 4)
        retried["_ref"] = {"query": ref_name, "runs": ref_runs}
        if "deep" in result:
            result["deep"]["value"] = round(
                sum(result["deep"]["queries"].values()), 4)
        result["value"] = round(sum(result["queries"].values()), 4)
        result["regression_gate"] = _regression_gate(result)
    result["regression_gate"]["retried"] = retried
    print(json.dumps(result))
    # Round-9 verdict #4: the driver archives only the LAST 2000 chars
    # of stdout, and the full result line above exceeds that once the
    # flagship/soak/recall sections are present — BENCH_r08 lost its
    # headline number to tail truncation. Emit a compact summary as the
    # FINAL line: small enough (~1.2 KB) to always sit inside the tail,
    # and self-sufficient for _regression_gate's history windows
    # (timing_action + per-query + deep timings, the three throughput
    # medians, soak ratios), so a tail-parsed round still feeds every
    # gate next round.
    compact = {
        k: result[k]
        for k in ("metric", "value", "unit", "sf", "timing_action",
                  "queries")
        if k in result
    }
    if "deep" in result:
        compact["deep"] = result["deep"]
    # Round-10 verdict #1 (self-adjudicating artifact): every
    # throughput section carries ALL pass timings ("runs", seconds) and
    # per-pass micro-batch counts ("nb") — two slow passes + unchanged
    # batch counts adjudicate a flag as host noise from the tail alone;
    # divergent batch counts or a one-sided slowdown say investigate.
    # Byte-budget key map (the 2000-char tail is hard): leg
    # "cps" = chunks_per_sec (full key kept at the top flagship level,
    # where the gate's history reader needs it); soak queries flatten
    # to {name: ratio}; ann_recall keys are the queries' numeric
    # prefixes (q49/q73/q99/q111) with values [reading, floor].
    def _tp(sec: dict, cps_key: str = "chunks_per_sec") -> dict:
        keep = {}
        if sec.get("chunks_per_sec") is not None:
            keep[cps_key] = sec["chunks_per_sec"]
        if sec.get("rows_per_sec") is not None:
            keep["rows_per_sec"] = sec["rows_per_sec"]
        # per-pass seconds at 1 decimal in the tail (byte budget; the
        # full line above keeps 2) — adjudication needs the cold/warm
        # split and cross-pass shape, not centiseconds
        if sec.get("runs") is not None:
            keep["runs"] = [round(r, 1) for r in sec["runs"]]
        if sec.get("nb") is not None:
            keep["nb"] = sec["nb"]
        return keep

    fs = result.get("flagship") or {}
    if fs:
        compact["flagship"] = _tp(fs)
        for leg in ("skew", "scale", "rocksdb", "scale_rocksdb"):
            if fs.get(leg):
                compact["flagship"][leg] = _tp(fs[leg], cps_key="cps")
        # checkpoint-profile A/B: the tail byte budget only fits the
        # headline figure — the leg NAME says which side the session
        # ran (local_ckpt present = session on Spark defaults and vice
        # versa); runs/nb live in the full line, and the within-round
        # 2x gate vs the even leg flags into `flagged` regardless
        for leg in ("local_ckpt", "default_ckpt"):
            if fs.get(leg):
                compact["flagship"][leg] = {
                    "cps": fs[leg].get("chunks_per_sec")}
    if result.get("streaming"):
        compact["streaming"] = _tp(result["streaming"])
    if result.get("curation"):
        compact["curation"] = {
            "docs_per_sec": result["curation"].get("docs_per_sec"),
            "verified": result["curation"].get("verified")}
    if result.get("soak"):
        # short `qNN` keys (round 12: the q86 leg pushed the worst-case
        # tail over budget on full names; ann_recall already uses the
        # same prefix scheme). _regression_gate resolves history under
        # either key form.
        compact["soak"] = {"queries": {
            q.split("_")[0]: s.get("ratio")
            for q, s in (result["soak"].get("queries") or {}).items()}}
    # recall evidence (round-9 verdict: the r09 tail could not prove the
    # floors were met): per leg, {query-prefix: [reading, floor]}
    if result.get("ann_recall"):
        compact["ann_recall"] = {
            leg: {q.split("_")[0]: [s["recall_at_5"], s["floor"]]
                  for q, s in queries.items()}
            for leg, queries in result["ann_recall"].items()}
    flags = sorted(result["regression_gate"]["flagged"])
    # cap so a heavily-flagged round cannot push the headline out of
    # the tail; the full flag dict is in the (truncatable) full line
    # (round 11: 4 -> 3 to keep the worst-case tail under budget with
    # the checkpoint-profile A/B leg added; n_flagged still reports
    # the true count)
    compact["flagged"] = flags[:3]
    if len(flags) > 3:
        compact["n_flagged"] = len(flags)
    print(json.dumps(compact))
    spark.stop()


_GATE_RATIO = 1.5


def _regression_gate(result: dict, here: str | None = None) -> dict:
    """Compare this run's per-query timings against the most recent
    committed BENCH_r*.json so a round-over-round regression can never
    land silently again (round-4 verdict ask #8). Queries slower than
    _GATE_RATIO x the prior round are flagged in the output JSON and
    shouted to stderr; absolute-floor 0.5s ignores warmup jitter.
    Throughput sections gate against the median of the last <=3 rounds
    (see the inline rationale). `here` overrides the history directory
    (tests only)."""
    import glob as _glob
    import re
    import statistics

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    rounds: list[tuple[int, dict]] = []
    for p in _glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as f:
                body = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = body.get("parsed", body)
        if isinstance(parsed, dict) and "queries" in parsed:
            rounds.append((int(m.group(1)), parsed))
    # key on the round number only: two files parsing to the same round
    # (BENCH_r7.json + BENCH_r07.json) must not fall through to dict
    # comparison and TypeError
    rounds.sort(key=lambda t: t[0])
    if not rounds:
        return {"baseline_round": None, "threshold": _GATE_RATIO,
                "flagged": {}}
    prior_n, prior = rounds[-1]
    # Per-query timings compare ONLY against rounds measured with the
    # same timing action (round-8 audit: the `.count()`-era numbers
    # under-measure any query whose count plan prunes work, so a
    # cross-methodology "regression" would be an artifact). Throughput
    # sections (flagship/streaming/curation) are wall-clock pipelines
    # unaffected by the query timing action and keep the full history.
    q_rounds = [
        (n, r) for n, r in rounds
        if r.get("timing_action") == result.get("timing_action")
    ]
    flagged: dict[str, dict] = {}
    # Per-query timings gate against the MEDIAN of the last <=3 rounds
    # (round-7 verdict #4): round 7 measured a uniform 7-47% host-state
    # drift on unchanged plans that brought q1 within noise of the
    # single-prior-round 1.5x threshold — the same variance class that
    # already moved the throughput sections to a median window. The
    # retry+`retried` protocol downstream is unchanged.
    for section in ("queries", "deep"):
        now = result.get(section) or {}
        if section == "deep":
            now = now.get("queries") or {}
        for q, t in now.items():
            hist = []
            for _, r in q_rounds[-3:]:
                ref = r.get(section) or {}
                if section == "deep":
                    ref = ref.get("queries") or {}
                if ref.get(q):
                    hist.append(ref[q])
            if not hist:
                continue
            t0 = statistics.median(hist)
            if t > _GATE_RATIO * t0 and t > 0.5:
                key = q if section == "queries" else f"deep:{q}"
                flagged[key] = {"now": t, "prev": round(t0, 4),
                                "window": hist,
                                "ratio": round(t / t0, 2)}
                print(f"# REGRESSION {key}: median {t0:.3f}s -> {t:.3f}s "
                      f"({t / t0:.2f}x)", file=sys.stderr)
    # throughput sections (round-5 verdict #3): bigger is better, so a
    # regression is now < baseline / _GATE_RATIO. Baseline is the
    # MEDIAN of the last <=3 rounds carrying the metric, not the single
    # prior round: these are wall-clock streaming figures with large
    # host-state variance (recorded history 1173 -> 1055 -> 1993
    # chunks/s on unchanged pipeline code), and gating against one
    # lucky round ratchets the bar to its noise peak — a healthy run
    # above the recorded median would flag as a phantom regression.
    # (Round 8: per-query timings moved to the same median window —
    # see the per-query loop above; the retry policy still handles
    # one-off bursts on top.)
    for section, metric in (("flagship", "chunks_per_sec"),
                            ("streaming", "rows_per_sec"),
                            ("curation", "docs_per_sec")):
        now_v = (result.get(section) or {}).get(metric)
        hist = [(r.get(section) or {}).get(metric)
                for _, r in rounds[-3:]]
        hist = [v for v in hist if v]
        # skip only when the section is genuinely absent (skipped via
        # env) or has no history; a metric of 0 with history is a total
        # collapse — exactly what the gate exists to catch
        if now_v is None or not hist:
            continue
        ref_v = statistics.median(hist)
        if now_v < ref_v / _GATE_RATIO:
            key = f"{section}:{metric}"
            flagged[key] = {"now": now_v, "prev": ref_v,
                            "window": hist,
                            "ratio": round(now_v / ref_v, 2)}
            print(f"# REGRESSION {key}: median{hist} -> {now_v} "
                  f"({now_v / ref_v:.2f}x)", file=sys.stderr)
    # scale-soak gate: the threshold is absolute (a super-linear
    # blowup is a scale bug whatever last round measured), but the
    # VALUE it is applied to is the median of this run's ratio plus the
    # last <=3 methodology-matched rounds' ratios (round-9 verdict #6:
    # minute-scale single-pass legs showed 1.0-7.2x host-state spread
    # on unchanged code — one noisy reading must not flag, while a
    # genuinely quadratic operator pushes the median over the bar
    # within a round of landing). No history => the current ratio IS
    # the median, so a first-round blowup still flags. Stated cost of
    # the median window: a super-linear regression landing after a
    # green history ([4,4,4,20] -> median 4) is not median-flagged for
    # 1-2 rounds — so a CATASTROPHIC current-round reading (> 2x the
    # gate on its own) flags immediately, median notwithstanding
    # (round-9 advice): genuine quadratics blow far past 2x the gate,
    # host noise historically stays under it (recorded spread 1.0-7.2x
    # vs the 30x hard bar).
    for q, s in ((result.get("soak") or {}).get("queries") or {}).items():
        hist = []
        for _, r in q_rounds[-3:]:
            sq = (r.get("soak") or {}).get("queries") or {}
            # history keys may be full query names (rounds <=11) or the
            # compact-tail short `qNN` prefixes (round 12+)
            ref = sq.get(q)
            if ref is None:
                ref = sq.get(q.split("_")[0])
            # history may be the full dict (old full-line artifacts) or
            # the flattened compact-tail float (round 10+)
            if isinstance(ref, dict):
                ref = ref.get("ratio")
            if ref is not None:
                hist.append(ref)
        window = hist + [s["ratio"]]
        med = statistics.median(window)
        if s["ratio"] > 2 * SOAK_MAX_RATIO:
            key = f"soak:{q}"
            flagged[key] = {"now": s["hi_sec"], "prev": s["lo_sec"],
                            "ratio": s["ratio"], "window": window,
                            "median": round(med, 2), "hard": True}
            print(f"# SCALE REGRESSION {key} (hard): x10 {s['lo_sec']}s "
                  f"-> x100 {s['hi_sec']}s (ratio {s['ratio']}x > "
                  f"{2 * SOAK_MAX_RATIO}x current-round bar)",
                  file=sys.stderr)
            continue
        if med > SOAK_MAX_RATIO:
            key = f"soak:{q}"
            flagged[key] = {"now": s["hi_sec"], "prev": s["lo_sec"],
                            "ratio": s["ratio"], "window": window,
                            "median": round(med, 2)}
            print(f"# SCALE REGRESSION {key}: x10 {s['lo_sec']}s -> "
                  f"x100 {s['hi_sec']}s (median {med:.1f}x of "
                  f"{window} > {SOAK_MAX_RATIO}x)", file=sys.stderr)
    # skew + scale + rocksdb gates: the hot-session leg, the
    # 1,000-stream leg and the RocksDB-provider leg must each stay
    # within 2x of the even leg's throughput (bounded per-key state —
    # round-6 ask #6, round-7 ask #8; provider parity — round-9 #5)
    fs = result.get("flagship") or {}
    even_v = fs.get("chunks_per_sec")
    # scale_rocksdb compares against the IN-MEMORY scale leg (same
    # workload, provider swapped — round-10 verdict #3), the others
    # against the even leg
    scale_v = (fs.get("scale") or {}).get("chunks_per_sec")
    for leg, base_v, base_name in (
            ("skew", even_v, "even"), ("scale", even_v, "even"),
            ("rocksdb", even_v, "even"),
            ("scale_rocksdb", scale_v, "scale"),
            # checkpoint-profile A/B (round-10 verdict #4): whichever
            # side the session did NOT run on — results are asserted
            # identical by the delivery loop; throughput within 2x
            ("local_ckpt", even_v, "even"),
            ("default_ckpt", even_v, "even")):
        leg_v = (fs.get(leg) or {}).get("chunks_per_sec")
        # `is not None`, not truthiness: a leg that ran and delivered 0
        # chunks/s is a total collapse and must flag (the same falsy-0
        # class the section-metric loop above already closes); only a
        # genuinely absent leg skips
        if leg_v is not None and base_v and leg_v < base_v / 2.0:
            flagged[f"flagship_{leg}:chunks_per_sec"] = {
                "now": leg_v, "prev": base_v,
                "ratio": round(leg_v / base_v, 2)}
            print(f"# {leg.upper()} REGRESSION flagship: {base_name} "
                  f"{base_v} -> {leg} {leg_v} chunks/s", file=sys.stderr)
    # segment-delivery invariant (round-9 #5): every flagship leg must
    # deliver exactly the batch-sessionizer's expected segment set —
    # a short count is dropped results (e.g. a state-store provider
    # changing semantics), not a throughput matter
    for key_name, sec in (("flagship", fs),) + tuple(
            (f"flagship_{leg}", fs.get(leg) or {})
            for leg in ("skew", "scale", "rocksdb", "scale_rocksdb",
                        "local_ckpt", "default_ckpt")):
        exp = sec.get("expected_segments")
        got = sec.get("segments")
        if exp is not None and got != exp:
            flagged[f"{key_name}:segments"] = {
                "now": got, "prev": exp,
                "ratio": round((got or 0) / exp, 2) if exp else 0.0}
            print(f"# SEGMENT REGRESSION {key_name}: {got} != "
                  f"expected {exp}", file=sys.stderr)
    # curation replay + ANN recall floors are absolute gates
    cur = result.get("curation") or {}
    if cur and not cur.get("verified", True):
        flagged["curation:verified"] = {"now": 0, "prev": 1, "ratio": 0.0}
        print("# CURATION REGRESSION: DuckDB replay mismatch",
              file=sys.stderr)
    for leg, queries in (result.get("ann_recall") or {}).items():
        for q, s in queries.items():
            if s["recall_at_5"] < s["floor"]:
                key = f"ann_recall:{leg}:{q}"
                flagged[key] = {"now": s["recall_at_5"],
                                "prev": s["floor"],
                                "ratio": round(
                                    s["recall_at_5"] / s["floor"], 2)}
                print(f"# RECALL REGRESSION {key}: {s['recall_at_5']} < "
                      f"floor {s['floor']}", file=sys.stderr)
    return {"baseline_round": prior_n, "threshold": _GATE_RATIO,
            # which rounds the per-query medians actually came from —
            # empty on the first round after a timing-methodology
            # change, making the skipped comparisons visible instead of
            # implying the new numbers were gated against baseline_round
            "query_history_rounds": [n for n, _ in q_rounds[-3:]],
            "flagged": flagged}


if __name__ == "__main__":
    main()
