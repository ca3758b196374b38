"""FastCDC content-defined chunking dedup (operators/cdc.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from streamprocess_spark.operators.cdc import (
    cdc_chunks_batch,
    cdc_chunks_udf,
    cdc_near_dup_groups,
    fnv1a_batch,
    np_cdc_chunks,
    np_chunk_hash,
)


def _hashes(data: bytes, **kw) -> set[int]:
    return {np_chunk_hash(data[o:o + ln])
            for o, ln in np_cdc_chunks(data, **kw)}


class TestChunking:
    def test_partition_covers_and_bounds(self):
        rng = np.random.default_rng(5)
        for n in (1, 100, 5000, 20000):
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            ch = np_cdc_chunks(data)
            assert sum(ln for _, ln in ch) == n
            offs = [o for o, _ in ch]
            assert offs == sorted(offs) and offs[0] == 0
            # every chunk except the tail respects [min, max]
            for o, ln in ch[:-1]:
                assert 128 <= ln <= 2048
            assert ch == np_cdc_chunks(data)       # deterministic

    def test_average_size_is_normalized(self):
        rng = np.random.default_rng(9)
        data = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
        lens = [ln for _, ln in np_cdc_chunks(data)]
        avg = sum(lens) / len(lens)
        # FastCDC's two-mask normalization keeps the mean near target
        assert 256 <= avg <= 1024, avg

    def test_insertion_shift_robust(self):
        """The CDC property fixed-size blocks lack: a local insertion
        leaves the chunk hashes after the edit intact."""
        rng = np.random.default_rng(7)
        data = rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()
        edited = data[:3000] + bytes(17) + data[3000:]
        h1, h2 = _hashes(data), _hashes(edited)
        assert len(h1 & h2) / len(h1 | h2) > 0.5

    def test_bad_params_rejected(self):
        with pytest.raises(ValueError, match="min_size"):
            np_cdc_chunks(b"xx", min_size=0)
        with pytest.raises(ValueError, match="min_size"):
            np_cdc_chunks(b"xx", min_size=100, avg_size=50)
        with pytest.raises(ValueError, match="min_size"):
            cdc_chunks_batch([b"xx"], min_size=0)


class TestBatchKernels:
    """The NumPy-blocked batch kernels (round-9: the UDF's production
    path) must be BIT-IDENTICAL to the scalar reference — boundaries
    and hashes both. The scalar functions are the oracle."""

    def _payloads(self):
        rng = np.random.default_rng(42)
        payloads = [
            rng.integers(0, 256, int(n), dtype=np.uint8).tobytes()
            for n in rng.integers(1, 30000, 30)
        ]
        # adversarial shapes: empty, constant runs (the q135 suffix
        # pattern), repeating period, single byte, exactly min/max size
        payloads += [
            b"", b"\x00" * 5000, b"\x7f" * 4096, bytes(range(256)) * 40,
            b"q", b"\x11" * 128, b"\x11" * 2048,
            np.random.default_rng(7).integers(
                0, 256, 4000, dtype=np.uint8).tobytes() + b"\x55" * 520,
        ]
        return payloads

    def test_boundaries_bit_identical_to_scalar(self):
        payloads = self._payloads()
        for params in (
            dict(),
            dict(min_size=64, avg_size=256, max_size=1024),
            dict(min_size=16, avg_size=16, max_size=64),
            dict(min_size=200, avg_size=200, max_size=400),
            dict(min_size=128, avg_size=4096, max_size=8192),
            # min_size < ks: the documented scalar-fallback branch
            dict(min_size=4, avg_size=512, max_size=2048),
        ):
            ref = [np_cdc_chunks(p, **params) for p in payloads]
            got = cdc_chunks_batch(payloads, **params)
            assert got == ref, params

    def test_hashes_bit_identical_to_scalar(self):
        payloads = self._payloads()
        chunks = cdc_chunks_batch(payloads)
        ref = [[np_chunk_hash(p[o:o + ln]) for o, ln in ch]
               for p, ch in zip(payloads, chunks)]
        assert fnv1a_batch(payloads, chunks) == ref

    def test_fnv_oversized_chunk_scalar_fallback(self):
        """Chunks past the slab/64 cutoff (unreachable via the UDF,
        reachable via the public API) must route to the scalar path
        and still hash identically, mixed in with blocked chunks
        (round-9 advice: rows≈1 slabs ran maxlen 1-element numpy ops)."""
        import streamprocess_spark.operators.cdc as cdc_mod

        cut = cdc_mod._FNV_SLAB_BYTES // 64
        rng = np.random.default_rng(11)
        big = rng.integers(0, 256, cut + 4096, dtype=np.uint8).tobytes()
        small = rng.integers(0, 256, 900, dtype=np.uint8).tobytes()
        payloads = [big, small, big[::-1]]
        chunks = [[(0, len(p))] for p in payloads]
        ref = [[np_chunk_hash(p)] for p in payloads]
        assert fnv1a_batch(payloads, chunks) == ref

    def test_fnv_slab_boundary(self, monkeypatch):
        """Slabbing must not change values: force tiny slabs so every
        length group crosses a slab edge."""
        import streamprocess_spark.operators.cdc as cdc_mod

        payloads = self._payloads()[:8]
        chunks = cdc_chunks_batch(payloads)
        ref = fnv1a_batch(payloads, chunks)
        monkeypatch.setattr(cdc_mod, "_FNV_SLAB_BYTES", 4096)
        assert fnv1a_batch(payloads, chunks) == ref


class TestSparkOp:
    def test_groups_recovered(self, spark):
        """Docs sharing a byte prefix land in one min-id group;
        unrelated docs stay singletons."""
        rng = np.random.default_rng(3)
        base = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
        other = rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
        rows = [
            (0, base + b"\x01" * 20),
            (1, base + b"\x02" * 40),
            (2, base + b"\x03" * 60),
            (3, other),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        chunked = df.select(
            "doc_id", cdc_chunks_udf()(F.col("payload")).alias("chunks")
        )
        out = {r.doc_id: r for r in cdc_near_dup_groups(chunked).collect()}
        assert [out[i].dup_group for i in range(4)] == [0, 0, 0, 3]
        assert [out[i].group_size for i in range(4)] == [3, 3, 3, 1]
        for i, payload in rows:
            assert out[i].payload_len == len(payload)

    def test_frequency_cap_drops_boilerplate(self, spark):
        """A chunk present in more docs than max_chunk_freq must not
        create pairs — the LSH-style cap that keeps buckets bounded."""
        rng = np.random.default_rng(11)
        boiler = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
        rows = [
            (i, boiler + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes())
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        chunked = df.select(
            "doc_id", cdc_chunks_udf()(F.col("payload")).alias("chunks")
        )
        out = cdc_near_dup_groups(chunked, max_chunk_freq=2).collect()
        # shared-prefix chunks appear in 5 > 2 docs → dropped → no
        # doc can reach jaccard 0.5 on its distinct majority
        assert all(r.dup_group == r.doc_id for r in out)

    def test_empty_payload_doc_keeps_its_row(self, spark):
        """A zero-chunk (empty-payload) doc must appear in the output
        as a singleton with payload_len 0 — the pre-round-13 contract,
        preserved across the single-pass restructure (the proxy keeps
        its row; only the pair path drops it)."""
        rng = np.random.default_rng(5)
        rows = [
            (0, b""),
            (1, rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        chunked = df.select(
            "doc_id", cdc_chunks_udf()(F.col("payload")).alias("chunks")
        )
        out = {r.doc_id: r for r in cdc_near_dup_groups(chunked).collect()}
        assert set(out) == {0, 1}
        assert out[0].payload_len == 0
        assert out[0].dup_group == 0 and out[0].group_size == 1

    def test_near_dup_groups_single_udf_pass_plan(self, spark):
        """Round-13 invariant: the operator materializes the per-doc
        proxy once (eager localCheckpoint), so the RETURNED plan holds
        ZERO Python-UDF nodes (every consumer reads the checkpoint)
        and the pair self-join is a merge join with no
        BroadcastExchange — the old plan re-ran the chunking UDF chain
        per consumer and collected one join side into a broadcast
        (unbounded at scale)."""
        rng = np.random.default_rng(7)
        rows = [
            (i, rng.integers(0, 256, 3000, dtype=np.uint8).tobytes())
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        chunked = df.select(
            "doc_id", cdc_chunks_udf()(F.col("payload")).alias("chunks")
        )
        out = cdc_near_dup_groups(chunked)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        plan = out._jdf.queryExecution().explainString(mode)
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "BroadcastExchange" not in plan
        assert "SortMergeJoin" in plan

    def test_repeated_chunks_use_set_semantics(self, spark):
        """Round-4 advice: payloads dominated by REPEATED identical
        chunks (zero padding — a long zero run chunks into identical
        max_size pieces) must still group. With duplicate-counted
        n_chunks the Jaccard denominator inflates (na=5, nb=9 here,
        ratio ~0.17) and the pair is missed; with distinct-hash
        counts both docs reduce to {zero-chunk, tail-chunk} and the
        ratio is 1.0."""
        tail = bytes(range(256)) * 2                  # shared 512B tail
        rows = [
            (0, b"\x00" * (2048 * 4) + tail),
            (1, b"\x00" * (2048 * 8) + tail),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        chunked = df.select(
            "doc_id", cdc_chunks_udf()(F.col("payload")).alias("chunks")
        )
        out = {r.doc_id: r for r in cdc_near_dup_groups(chunked).collect()}
        assert out[0].dup_group == 0 and out[1].dup_group == 0
        assert out[0].group_size == 2 and out[1].group_size == 2
