"""Physical-plan regression tests: the scale properties we claim
(broadcast dims, predicate pushdown, no cartesian products, bounded
exchanges in the LSH pipeline) must actually appear in the optimized
plans — `.explain` is part of the test surface, not just a debugging
aid."""

from __future__ import annotations

import re

import pytest

from streamprocess_spark.plans import query_map
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = query_map()[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_join_queries_broadcast_dimensions(spark):
    for name in ("q2_shipping_priority", "q3_local_supplier_volume"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_filters_reach_parquet_scan(spark):
    plan = _plan(spark, "q2_shipping_priority")
    assert "PushedFilters: [" in plan
    # the BUILDING segment filter must be pushed, not applied post-scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_config_join_is_broadcast(spark):
    assert "BroadcastHashJoin" in _plan(spark, "q69_config_broadcast")


def test_no_cartesian_products_anywhere(spark):
    for name in (
        "q45_minhash_lsh",
        "q48_embedding_topk",
        "q49_ann_lsh_topk",
        "q47_ngram_jaccard",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_minhash_band_plan_is_single_pass(spark):
    """The banding explode must not multiply the signature subtree:
    one aggregate per join side, bounded exchange count (a per-band
    union regressed this to 18 exchanges / 8 scans). Round 12: the
    candidate self-join must be the MERGE-hinted sort-merge form — a
    broadcast build here means the ENTIRE banded corpus is collected
    to the driver (unbounded at 100 TB), and the merge form's
    byte-identical shuffle subtrees are what AQE's exchange reuse
    dedupes at runtime (the measured win at every scale)."""
    plan = _plan(spark, "q45_minhash_lsh")
    n_exchanges = len(
        re.findall(r"^\(\d+\) (?:Broadcast)?Exchange", plan, re.MULTILINE)
    )
    assert n_exchanges <= 6, f"minhash plan regressed: {n_exchanges} exchanges"
    assert "SortMergeJoin" in plan
    assert "BroadcastExchange" not in plan


def test_cc_family_candidate_pair_plan_no_broadcast(spark):
    """Round-12 verdict #7: q86/q87's committed plan dumps are vacuous
    (connected_components localCheckpoints eagerly, so the registered
    query's plan is a 2-node ExistingRDD scan) — pin the PRE-checkpoint
    candidate-pair subtree those queries actually execute instead.
    It must carry the q45 invariants: merge-form self-join, zero
    BroadcastExchange (a broadcast build here collects the whole
    banded corpus to the driver — unbounded at 100 TB)."""
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.operators import dedup as D

    docs = load_tables(spark, SF_DIR)["documents"]
    pairs = D.minhash_candidates(docs, "doc_id", "text").select(
        "doc_a", "doc_b"
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pairs._jdf.queryExecution().explainString(mode)
    assert "SortMergeJoin" in plan
    assert "BroadcastExchange" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_equi_not_nested_loop(spark):
    """q80's whole point: the bounded range join must plan as a hash/
    sort-merge equi-join on (user, bucket), never the nested-loop the
    literal inequality condition would produce."""
    plan = _plan(spark, "q80_range_bucket_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_asof_join_is_single_shuffle_no_join(spark):
    """q79 composes the as-of join as union + window: the plan must
    contain NO join operator and exactly one real exchange (the
    user_id hash partitioning feeding the window)."""
    plan = _plan(spark, "q79_asof_join")
    assert "Join" not in plan
    # formatted explain renders each operator twice (tree + detail);
    # count only the numbered detail headers
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, f"expected 1 shuffle, saw {n_exchanges}"


def test_media_pipelines_are_map_only(spark):
    """The per-row media paths (PNG ingest, video frame sampling,
    token counting) must plan with ZERO exchanges — any shuffle in a
    decode/sample/count pipeline is a plan regression that would
    dominate at 100 TB."""
    import re

    for name in ("q92_png_ingest", "q93_video_frames", "q94_token_counts"):
        plan = _plan(spark, name)
        n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
        assert n_exchanges == 0, f"{name}: {n_exchanges} exchanges in map-only path"


def test_winnowing_bounded_shuffles(spark):
    """q95: one shuffle to co-locate shingles by doc (window), one for
    the distinct, one for the final agg — never a per-window re-shuffle
    or a cartesian."""
    import re

    plan = _plan(spark, "q95_winnowing")
    assert "CartesianProduct" not in plan
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges <= 3, f"winnowing plan regressed: {n_exchanges} exchanges"


def test_topk_projects_before_ranking(spark):
    """cosine_topk must not shuffle embedding arrays through the
    ranking window — the window input carries only (qid, cid, score)."""
    plan = _plan(spark, "q48_embedding_topk")
    lines = plan.splitlines()
    window_blocks = [
        i for i, line in enumerate(lines) if "Window" in line and "spec" not in line
    ]
    assert window_blocks, "expected window operators in top-k plan"
    # the rows feeding each ranking window must not include array cols
    # (column refs render as name#id, e.g. "qe#12")
    for i in window_blocks:
        ctx = "\n".join(lines[i : i + 6])
        assert "qe#" not in ctx and "ce#" not in ctx, ctx


def test_fixture_scans_are_splittable(spark):
    """Round-8 scale finding: a parquet row group is read by the
    byte-range split containing its midpoint, so a single-row-group
    fixture file pins the ENTIRE scan-stage pipeline (Arrow UDF
    synthesis, shingle+md5, partial aggs) to one core no matter how
    many partitions the scan plans. The io/tables.py staging layer
    must keep fixture tables re-chunked; this pins it so a fixture
    regeneration (new driver round, new testdata) can't silently
    reintroduce 1-core map stages."""
    import pyarrow.parquet as pq

    from streamprocess_spark.io.tables import load_tables, table_path

    # staged documents must carry >1 row group AND scan as >1 partition
    staged = table_path(SF_DIR, "documents")
    assert pq.read_metadata(staged).num_row_groups > 1
    docs = load_tables(spark, SF_DIR)["documents"]
    assert docs.rdd.getNumPartitions() > 1
    # values are untouched by the re-chunk
    raw = pq.read_table(f"{SF_DIR}/documents.parquet").sort_by("doc_id")
    assert pq.read_table(staged).sort_by("doc_id").equals(raw)
    # tiny dimension tables are left alone (nothing to parallelize)
    assert table_path(SF_DIR, "region") == f"{SF_DIR}/region.parquet"


def test_bpe_train_depth64_flat_cost(spark):
    """Round-10 verdict #4: bpe_train must hold per-round cost flat at
    a realistic merge depth — the previous lazy-lineage form made
    round r re-execute the corpus scan + all r-1 earlier rewrites
    (the round-7 k-means lineage blowup). Structural pins (exact):
    after every round the symbol table's plan is a checkpointed leaf —
    zero parquet scans — so round cost cannot grow with depth; the
    depth-64 merge table extends the registered depth-3 prefix
    unchanged. Wall-clock pin (generous): the last-quarter median of
    per-round times stays within 3x the first-quarter median — a
    linear lineage would put round ~60 at ~20x round ~8."""
    import statistics

    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.plans.llm_pipeline import bpe_train
    from streamprocess_spark.plans.registry import QUERIES

    docs = load_tables(spark, SF_DIR)["documents"]
    times: list[float] = []
    deep = bpe_train(spark, docs, rounds=64, round_times=times).collect()
    assert len(deep) == 64, len(deep)
    # the depth-3 registered query is a strict prefix (same argmax path)
    shallow = QUERIES["q112_bpe_train"].builder(spark, SF_DIR).collect()
    assert [tuple(r) for r in shallow] == [tuple(r) for r in deep[:3]]
    assert len(times) == 64
    q = len(times) // 4
    first, last = statistics.median(times[:q]), statistics.median(times[-q:])
    assert last < 3 * first, (first, last, times)


def test_bpe_train_symbol_table_is_checkpointed_leaf(spark):
    """The structural half of the depth-64 pin, deterministic: a
    mid-training symbol table plans as a leaf relation (no parquet
    scan, no join), so each round is exactly one vocab-pass shuffle."""
    from streamprocess_spark.plans import query_map

    df = query_map()["q112_bpe_train"](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "Scan parquet" not in plan and "Join" not in plan, plan


def test_bpe_train_releases_prior_checkpoints(spark):
    """Round-10 advice: each training round localCheckpoints a new
    symbol-table generation; the prior generation's storage blocks
    must be unpersisted as soon as the new one materializes, so live
    checkpoint storage is one generation whatever the merge depth —
    not thousands of dead generations waiting on GC + ContextCleaner."""
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.plans.llm_pipeline import bpe_train

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    docs = load_tables(spark, SF_DIR)["documents"]
    out = bpe_train(spark, docs, rounds=8).collect()
    assert len(out) == 8
    # everything the trainer pinned has been released again
    assert jsc.getPersistentRDDs().size() <= before
