"""Partitioned Bloom-index admission (operators/bloom.py, q153).

The operator's contract has three independently checkable parts:
  1. NO FALSE NEGATIVES — every indexed key must probe True (this is
     what makes the bloom a sound ROUTER: a false negative would admit
     a duplicate without confirmation, silently corrupting the corpus);
  2. determinism — bitmaps are partitioning-invariant (bit-OR is
     commutative), so the persisted index artifact is reproducible;
  3. exactness of the COMPOSED query — whatever the filter's FP rate,
     q153's admitted set equals plain anti-join semantics (the DuckDB
     oracle in test_oracle_parity re-checks this cross-engine).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from streamprocess_spark.operators import bloom as B
from streamprocess_spark.plans import query_map
from tests.conftest import SF_DIR


def _corpus(spark, n=1000, start=0):
    return spark.range(start, start + n).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    corpus = _corpus(spark)
    idx = B.bloom_index(corpus, "key")
    self_probe = B.bloom_probe(corpus, "key", idx)
    assert self_probe.filter(~F.col("maybe_dup")).count() == 0


def test_index_is_partitioning_invariant(spark):
    corpus = _corpus(spark)
    a = {r.bucket: bytes(r.bitmap)
         for r in B.bloom_index(corpus, "key").collect()}
    b = {r.bucket: bytes(r.bitmap)
         for r in B.bloom_index(corpus.repartition(7), "key").collect()}
    assert a == b
    assert len(a) == B.N_BUCKETS
    assert all(len(v) == B.BITS_PER_BUCKET // 8 for v in a.values())


def test_routing_splits_batch_and_fp_rate_is_tiny(spark):
    # batch = 500 known members + 500 fresh keys
    idx = B.bloom_index(_corpus(spark, 1000, 0), "key")
    batch = _corpus(spark, 1000, 500)
    probed = B.bloom_probe(batch, "key", idx)
    n_maybe = probed.filter(F.col("maybe_dup")).count()
    n_fresh = probed.filter(~F.col("maybe_dup")).count()
    assert n_maybe + n_fresh == 1000
    # all 500 true members must route to confirm (no false negatives);
    # the false-positive surplus at this sizing (~4.6 bits/key, k=7)
    # must stay tiny
    assert 500 <= n_maybe <= 510


def test_probe_handles_index_only_buckets(spark):
    # the cogroup also emits groups where the INDEX has a bucket but
    # the batch has no rows — the probe must return an empty frame for
    # those, not crash on zero-length position arrays
    idx = B.bloom_index(_corpus(spark, 1000), "key")
    one = _corpus(spark, 1)  # batch hits ~1 bucket; ~63 are index-only
    probed = B.bloom_probe(one, "key", idx)
    rows = probed.collect()
    assert len(rows) == 1 and rows[0].maybe_dup is True


def test_probe_handles_empty_buckets(spark):
    # a 1-key index leaves 63 buckets unbuilt; probing keys that land
    # in them must yield definite False, not a crash
    idx = B.bloom_index(_corpus(spark, 1), "key")
    assert idx.count() == 1
    probed = B.bloom_probe(_corpus(spark, 256), "key", idx)
    assert probed.count() == 256
    assert probed.filter(F.col("maybe_dup")).count() == 1


def test_merge_equals_rebuild(spark):
    """Incremental maintenance exactness: OR-merging per-batch indexes
    must equal rebuilding from the union — bit-for-bit — including
    when the batches populate disjoint bucket subsets (the full-outer
    edge)."""
    a, b = _corpus(spark, 300, 0), _corpus(spark, 300, 300)
    merged = B.bloom_merge(B.bloom_index(a, "key"), B.bloom_index(b, "key"))
    rebuilt = B.bloom_index(a.unionByName(b), "key")
    m = {r.bucket: bytes(r.bitmap) for r in merged.collect()}
    rb = {r.bucket: bytes(r.bitmap) for r in rebuilt.collect()}
    assert m == rb
    # disjoint-bucket edge: 1-key indexes land in (usually) different
    # buckets; merge must keep both rows intact
    one_a, one_b = _corpus(spark, 1, 0), _corpus(spark, 1, 1)
    m2 = B.bloom_merge(B.bloom_index(one_a, "key"), B.bloom_index(one_b, "key"))
    rb2 = B.bloom_index(one_a.unionByName(one_b), "key")
    assert {r.bucket: bytes(r.bitmap) for r in m2.collect()} == \
           {r.bucket: bytes(r.bitmap) for r in rb2.collect()}


def test_index_roundtrips_through_txlog(spark, tmp_path):
    """The 'persistable daily artifact' claim as code: write the index
    through the txlog table format, read it back at a later version
    (after an OR-maintenance append cycle rewrote it), and probe —
    identical routing to the in-memory index."""
    from streamprocess_spark.io.txlog import TxTable

    day1, day2 = _corpus(spark, 400, 0), _corpus(spark, 400, 400)
    idx1 = B.bloom_index(day1, "key")
    t = TxTable.create(spark, str(tmp_path / "bloom_idx"), idx1)
    # day-2 maintenance: fold the new batch in, publish atomically
    merged = B.bloom_merge(t.read(spark), B.bloom_index(day2, "key"))
    t.rewrite(merged, expected_version=t.latest_version())

    probe_batch = _corpus(spark, 1200, 0)  # 800 members + 400 fresh
    from_disk = B.bloom_probe(probe_batch, "key", t.read(spark))
    in_mem = B.bloom_probe(
        probe_batch, "key",
        B.bloom_index(day1.unionByName(day2), "key"),
    )
    got = {r.key: r.maybe_dup for r in from_disk.collect()}
    want = {r.key: r.maybe_dup for r in in_mem.collect()}
    assert got == want
    assert sum(got.values()) >= 800  # every true member routes to confirm


def test_q153_equals_naive_anti_join(spark):
    out = query_map()["q153_bloom_admission"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.md5("text").alias("content_hash")
    )
    naive = docs.filter(F.col("doc_id") % 2 == 1).join(
        docs.filter(F.col("doc_id") % 2 == 0).select("content_hash"),
        "content_hash",
        "left_anti",
    )
    got = {(r.doc_id, r.content_hash) for r in out.collect()}
    want = {(r.doc_id, r.content_hash) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_q153_plan_has_no_shuffle_joins(spark):
    """The reduction's whole point: every join broadcasts a bounded
    side — no SortMergeJoin/shuffle of the corpus — and the bloom
    index enters the plan as a materialized leaf, not the build
    subtree."""
    df = query_map()["q153_bloom_admission"](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    tree = plan.split("\n\n", 1)[0]
    assert "SortMergeJoin" not in tree
    assert "ShuffledHashJoin" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "Scan ExistingRDD" in tree  # the checkpointed bloom index
