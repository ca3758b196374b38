"""Content-defined chunking (FastCDC) dedup over BINARY columns.

The text dedup family (operators/dedup.py — MinHash/SimHash/exact)
works on token shingles; large multimodal corpora also need dedup at
the BYTE level — re-uploaded media with appended metadata, re-muxed
containers, partially-edited blobs — where token shingling does not
apply. Content-defined chunking splits each payload at positions
determined by a rolling hash of the content itself, so a local edit
only perturbs the chunk(s) it touches while every other chunk hash
survives — insertion-shift-proof, unlike fixed-size blocks.

Algorithm: FastCDC (Xia et al., USENIX ATC'16 — public paper):
  - Gear rolling hash  h = (h << 1 + gear[byte]) mod 2^64  (one shift
    + one table lookup per byte; the 256-entry gear table is derived
    deterministically from splitmix64 so every executor agrees);
  - normalized chunking: positions before the target average size use
    a STRICTER mask (more bits), after it a LOOSER one — tightening
    the chunk-size distribution around the average;
  - hard floor/ceiling (min_size skip, max_size forced cut).

Spark shape (100 TB layout): chunking is a map-only Arrow UDF inside
the scan partition; cross-document matching is a chunk-hash
equi-join — the same bucket-local pattern as MinHash banding, with a
frequency cap dropping degenerate super-common chunks (boilerplate
headers) exactly like LSH band caps. No all-pairs stage anywhere.

Reference parity: the reference has no byte-level dedup (its dedup is
whole-file hashes); this operator extends the training-data pipeline
per the same public-corpus-curation literature as MinHash/SemDeDup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T
from pyspark.sql.functions import pandas_udf

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _splitmix64(seed: int, n: int) -> np.ndarray:
    """Deterministic 64-bit stream (public splitmix64 recurrence)."""
    out = np.empty(n, dtype=np.uint64)
    x = np.uint64(seed)
    golden = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for i in range(n):
            x = x + golden
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[i] = z ^ (z >> np.uint64(31))
    return out


_GEAR = _splitmix64(0x5370436863, 256)          # shared by all executors


# Python-int mirrors of the hash constants: the byte loops below run
# ~20x faster on native ints (+ masking) than on numpy uint64 SCALARS
# (each numpy scalar op is a ~1 µs dispatch; a native int op is ~30 ns).
# (a op b) & MASK64 per step is exactly uint64 wraparound, so outputs
# are bit-identical to the previous numpy-scalar form (pinned by
# tests/test_cdc.py's golden/differential cases).
_MASK64 = (1 << 64) - 1
_GEAR_I = [int(x) for x in _GEAR]   # derived: one table, two dtypes


def np_cdc_chunks(data: bytes, min_size: int = 128, avg_size: int = 512,
                  max_size: int = 2048) -> list[tuple[int, int]]:
    """FastCDC boundaries → [(offset, length), ...] covering `data`
    exactly. Pure function of the bytes — every executor and every
    day's batch produces identical chunks for identical content."""
    if not 0 < min_size <= avg_size <= max_size:
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    bits = max(1, int(avg_size).bit_length() - 1)
    mask_s = (1 << (bits + 2)) - 1              # strict before avg point
    mask_l = (1 << max(1, bits - 2)) - 1        # loose after
    n = len(data)
    data = bytes(data)                          # int per index
    gear = _GEAR_I
    chunks: list[tuple[int, int]] = []
    start = 0
    while start < n:
        end = min(start + max_size, n)
        cut = end                                # default: ceiling / tail
        h = 0
        norm = min(start + avg_size, end)
        for i in range(start + min_size, end):
            h = ((h << 1) + gear[data[i]]) & _MASK64
            if (h & (mask_s if i < norm else mask_l)) == 0:
                cut = i + 1
                break
        chunks.append((start, cut - start))
        start = cut
    return chunks


def np_chunk_hash(data: bytes) -> int:
    """FNV-1a 64 over a chunk, returned as signed int64 (Spark LongType)."""
    h = int(_FNV_OFFSET)
    p = int(_FNV_PRIME)
    for b in bytes(data):
        h = ((h ^ b) * p) & _MASK64
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# NumPy-blocked batch kernels (round-9 verdict #2). The scalar
# np_cdc_chunks / np_chunk_hash above stay as the bit-exact REFERENCE
# (and the differential oracle in tests/test_cdc.py); the Arrow UDF
# runs the batch kernels below, which produce identical output at a
# fraction of the per-byte Python cost (~14x at the q135 payload
# shape — the engine's slowest linear stage at soak x1000 was this
# module's pure-Python byte walking, 873.7 s for 5M docs).
#
# Why the gear scan CAN be blocked even though the rolling hash is
# sequential: the boundary test is `h & mask == 0` with a k-bit mask,
# and `h << 1` per step shifts every older byte's contribution out of
# the low k bits — so (h & mask) at position i depends ONLY on the
# last k bytes, h&mask = sum_{j<k} gear[data[i-j]]<<j (mod 2^k).
# Candidate positions are therefore precomputable with vectorized
# window sums over the whole (concatenated) batch, independent of
# where chunks start; the sequential cut walk just consumes them in
# order. The only positions needing the true sequential h are the
# first k-1 after each hash reset (fewer than k bytes accumulated),
# which get an exact scalar check — output is bit-identical.
# ---------------------------------------------------------------------------


def cdc_chunks_batch(
    payloads: list[bytes], min_size: int = 128, avg_size: int = 512,
    max_size: int = 2048,
) -> list[list[tuple[int, int]]]:
    """np_cdc_chunks over a batch — identical output, NumPy-blocked.

    Pipeline: (1) the LOOSE kl-bit window sum over the concatenated
    batch in uint8 wrap arithmetic (only the value mod 2^kl matters
    and kl <= 8 at any avg_size <= 2048, so natural uint8 wraparound
    is exact — 4x less memory traffic than int32); (2) loose zeros ->
    cand_l (~2^-kl of positions); (3) the strict ks-bit window sum
    evaluated SPARSELY at cand_l positions only (strict zero implies
    loose zero, so cand_s is a subset of cand_l); (4) a per-payload
    walk consuming both candidate lists with forward-only pointers —
    O(candidates + chunks), no per-chunk binary search — plus the
    <=ks-1-byte exact scalar prefix after each reset."""
    if not 0 < min_size <= avg_size <= max_size:
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    bits = max(1, int(avg_size).bit_length() - 1)
    ks, kl = bits + 2, max(1, bits - 2)
    mask_s = (1 << ks) - 1
    mask_l = (1 << kl) - 1
    if min_size < ks or kl > 16:
        # min_size < ks: candidate windows would cross the previous
        # chunk before the reset exactness point; kl > 16: the uint16
        # loose pass below would wrap short of the mask. Both are far
        # outside the operating envelope — keep the scalar reference.
        return [np_cdc_chunks(bytes(p), min_size, avg_size, max_size)
                for p in payloads]

    raws = [bytes(p) for p in payloads]
    offs = [0]
    for p in raws:
        offs.append(offs[-1] + len(p))
    cat = np.frombuffer(b"".join(raws), dtype=np.uint8)
    if len(cat) == 0:
        return [[] for _ in raws]
    # loose window sum, mod-2^width wrap arithmetic (width >= kl)
    ldt = np.uint8 if kl <= 8 else np.uint16
    tab_l = (_GEAR & np.uint64(mask_l)).astype(ldt)
    gl = tab_l[cat]
    acc = np.zeros(len(cat), dtype=ldt)
    buf = np.empty(len(cat), dtype=ldt)            # reused scratch
    for j in range(kl):
        np.left_shift(gl[: len(cat) - j], j, out=buf[: len(cat) - j])
        acc[j:] += buf[: len(cat) - j]
    cand_l = np.flatnonzero((acc & ldt(mask_l)) == 0)
    # strict window sum only at loose-candidate positions (sparse).
    # Near ks = 31 the true sum of ks terms of up to 2^(2ks-1) can
    # exceed int64 range, but numpy int64 wraps mod 2^64 and only the
    # low ks bits are tested below, so the wraparound is benign — the
    # tested bits are exact for any ks <= 31 (round-9 advice: this is
    # wrap-correctness, not sum exactness). Wrapped gathers at the
    # first ks-1 global positions are garbage but those positions are
    # never consulted (every query point is >= lo + kl - 1 >=
    # min_size + kl - 1 inside its payload).
    tab_s = (_GEAR & np.uint64(mask_s)).astype(np.int64)
    ws = np.zeros(len(cand_l), dtype=np.int64)
    for j in range(ks):
        ws += tab_s[cat[cand_l - j]] << j
    cand_s = cand_l[(ws & mask_s) == 0]
    ll: list[int] = cand_l.tolist()
    sl: list[int] = cand_s.tolist()
    nl, ns = len(ll), len(sl)

    gear = _GEAR_I
    m64 = _MASK64
    out: list[list[tuple[int, int]]] = []
    il = is_ = 0                                   # forward-only pointers
    for pi, data in enumerate(raws):
        base, n = offs[pi], len(data)
        chunks: list[tuple[int, int]] = []
        start = 0
        while start < n:
            end = start + max_size
            if end > n:
                end = n
            lo = start + min_size
            norm = start + avg_size
            if norm > end:
                norm = end
            cut = 0
            # zone A [lo, lo+kl-1): true h has < kl bytes — exact scalar
            za = lo + kl - 1
            if za > end:
                za = end
            h = 0
            for i in range(lo, za):
                h = ((h << 1) + gear[data[i]]) & m64
                if (h & (mask_s if i < norm else mask_l)) == 0:
                    cut = i + 1
                    break
            if not cut and za < end:
                gza = base + za
                gzb = base + min(lo + ks - 1, end)
                while il < nl and ll[il] < gza:
                    il += 1
                # zone B [lo+kl-1, lo+ks-1): loose test is window-exact
                # (>= kl bytes); a strict zero must ALSO be a loose zero,
                # so only cand_l members need the exact-h verify
                j = il
                while j < nl and ll[j] < gzb:
                    p = ll[j] - base
                    if p >= norm:                  # loose region: exact
                        cut = p + 1
                        break
                    hh = 0                         # strict: verify true h
                    for i in range(lo, p + 1):
                        hh = ((hh << 1) + gear[data[i]]) & m64
                    if (hh & mask_s) == 0:
                        cut = p + 1
                        break
                    j += 1
                if not cut:
                    # zone C strict [lo+ks-1, norm): cand_s is exact
                    ga = base + max(lo + ks - 1, lo)
                    gb = base + norm
                    if ga < gb:
                        while is_ < ns and sl[is_] < ga:
                            is_ += 1
                        if is_ < ns and sl[is_] < gb:
                            cut = sl[is_] - base + 1
                    if not cut:
                        # zone C loose [max(norm, lo+ks-1), end)
                        ga = base + max(norm, lo + ks - 1)
                        gb = base + end
                        j = il
                        while j < nl and ll[j] < ga:
                            j += 1
                        if j < nl and ll[j] < gb:
                            cut = ll[j] - base + 1
            if not cut:
                cut = end
            chunks.append((start, cut - start))
            start = cut
        out.append(chunks)
    return out


# slab bound for the lockstep FNV byte matrix: keep the padded matrix
# cache-resident (strided column reads are the hot access pattern)
_FNV_SLAB_BYTES = 16 << 20


def fnv1a_batch(
    raws: list[bytes], chunk_lists: list[list[tuple[int, int]]]
) -> list[list[int]]:
    """np_chunk_hash for every chunk of every payload — identical
    values, computed in lockstep: FNV-1a is a strict byte-serial
    recurrence WITHIN a chunk, but chunks are independent, so the
    whole batch advances one byte position per step over a padded
    byte matrix ((h ^ col) * prime on uint64 vectors, natural mod-2^64
    wraparound). Chunks are length-sorted so the active set is a
    shrinking prefix (no masks), and processed in cache-sized slabs."""
    views: list[memoryview] = []
    lens: list[int] = []
    for p, chunks in zip(raws, chunk_lists):
        mv = memoryview(p)
        for o, ln in chunks:
            views.append(mv[o:o + ln])
            lens.append(ln)
    C = len(lens)
    if C == 0:
        return [[] for _ in raws]
    lens_a = np.asarray(lens, dtype=np.int64)
    res = np.empty(C, dtype=np.int64)
    # Round-9 advice: a chunk longer than slab/64 would degrade the
    # blocked pass to rows≈1 — maxlen iterations of 1-element numpy
    # ops, orders of magnitude slower than the scalar loop. Unreachable
    # via cdc_chunks_udf (max_size caps chunks at 2 KiB), but this is
    # public API: route oversized chunks to the scalar reference and
    # lockstep-block only the rest.
    scalar_cut = _FNV_SLAB_BYTES // 64
    for oi in np.flatnonzero(lens_a > scalar_cut):
        res[oi] = np_chunk_hash(views[oi])
    order = np.argsort(-lens_a, kind="stable")     # longest first
    order = order[lens_a[order] <= scalar_cut]
    prime = _FNV_PRIME
    r0 = 0
    while r0 < len(order):
        maxlen = int(lens_a[order[r0]])
        rows = max(1, _FNV_SLAB_BYTES // max(1, maxlen))
        sel = order[r0:r0 + rows]
        r0 += rows
        slens = lens_a[sel]
        mat = np.zeros((len(sel), maxlen), dtype=np.uint8)
        for r, oi in enumerate(sel):
            v = views[oi]
            if len(v):
                mat[r, : len(v)] = np.frombuffer(v, dtype=np.uint8)
        h = np.full(len(sel), _FNV_OFFSET, dtype=np.uint64)
        neg = -slens                               # ascending for search
        with np.errstate(over="ignore"):
            for j in range(maxlen):
                k = int(np.searchsorted(neg, -(j + 1), side="right"))
                if k == 0:
                    break
                hj = h[:k]
                hj ^= mat[:k, j]
                hj *= prime
        res[sel] = h.astype(np.int64)
    out: list[list[int]] = []
    i = 0
    for chunks in chunk_lists:
        out.append([int(x) for x in res[i:i + len(chunks)]])
        i += len(chunks)
    return out


_CHUNK_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("chunk_hash", T.LongType()),
    T.StructField("chunk_len", T.IntegerType()),
]))


def cdc_chunks_udf(min_size: int = 128, avg_size: int = 512,
                   max_size: int = 2048):
    @pandas_udf(_CHUNK_SCHEMA)
    def _udf(payload: pd.Series) -> pd.Series:
        raws = [bytes(r) for r in payload]
        chunk_lists = cdc_chunks_batch(raws, min_size, avg_size, max_size)
        hashes = fnv1a_batch(raws, chunk_lists)
        return pd.Series([
            [{"chunk_hash": hv, "chunk_len": ln}
             for hv, (_, ln) in zip(hs, ch)]
            for hs, ch in zip(hashes, chunk_lists)
        ])
    return _udf


def cdc_near_dup_groups(
    chunked: DataFrame,
    id_col: str = "doc_id",
    jaccard: float = 0.5,
    max_chunk_freq: int = 256,
) -> DataFrame:
    """(id, chunks array) → (id, payload_len, dup_group, group_size).

    dup_group = min id over documents sharing >= `jaccard` of their
    chunk-hash sets (single hop: byte-level dup groups share a common
    prefix/backbone, so the similarity graph within a group is
    complete and min-over-neighbors is already the fixpoint — unlike
    token-level near-dup chains, which go through the iterative
    connected_components operator instead).

    Scale: one explode, one chunk-hash equi-join (bucket-local), one
    per-pair aggregation; chunks seen in > max_chunk_freq docs are
    dropped before pairing (boilerplate cap, same role as LSH band
    caps) so no hash bucket can go quadratic.

    Round-13 single-pass restructure (q139/q45 treatment + guide §8
    "decide with small rows" — the chunking UDF chain above this
    operator is the expensive stage, and the old plan executed it
    THREE times: once per self-join side, once for the all-docs
    payload_len table, with one join side ADDITIONALLY collected into
    a BroadcastExchange, unbounded at 100 TB):
      - the per-doc proxy (id, payload_len, distinct chunk-hash set —
        the §8 "fingerprint table": a few dozen bytes per doc, no
        payload bytes) is materialized ONCE with an eager
        localCheckpoint, the same within-run lineage-control pattern
        as connected_components — every run recomputes it from the
        parquet inputs; nothing persists across runs. The UDF chain
        now executes exactly once however many consumers the plan has;
      - set semantics come from the proxy's ``array_distinct`` instead
        of explode + ``.distinct()`` — deletes one full-data shuffle
        per join side;
      - the pair self-join carries the q45 MERGE hint: left to size
        estimates Catalyst planned BroadcastHashJoin whose build side
        was the ENTIRE capped chunk table (unbounded); the merge sides
        are byte-identical subtrees over the checkpointed proxy, so
        AQE exchange reuse computes the band-style window exchange
        once and sorts it twice;
      - the all-docs (id, payload_len) side is a map over the proxy —
        zero-chunk (empty-payload) docs keep their output row exactly
        as before (their empty hash set never reaches the explode)."""
    per_doc = chunked.select(
        F.col(id_col),
        F.aggregate(
            "chunks", F.lit(0).cast("long"),
            lambda a, c: a + c["chunk_len"].cast("long"),
        ).alias("payload_len"),
        # DISTINCT hashes: `shared` below counts distinct hashes, so
        # both sides of the Jaccard ratio must use set semantics —
        # duplicate-counted chunks (zero padding, repeated headers)
        # would otherwise deflate the ratio and miss true duplicates
        # (round-4 advice)
        F.array_distinct(F.col("chunks.chunk_hash")).alias("hashes"),
    ).localCheckpoint(eager=True)
    ex = per_doc.select(
        F.col(id_col),
        F.size("hashes").cast("long").alias("n_chunks"),
        F.explode("hashes").alias("chunk_hash"),
    )
    capped = (
        ex.withColumn(
            "freq",
            F.count(F.lit(1)).over(Window.partitionBy("chunk_hash")),
        )
        .filter(F.col("freq") <= max_chunk_freq)
        .drop("freq")
    )
    a = capped.select(
        F.col(id_col).alias("ida"), F.col("n_chunks").alias("na"),
        "chunk_hash",
    )
    b = capped.select(
        F.col(id_col).alias("idb"), F.col("n_chunks").alias("nb"),
        "chunk_hash",
    )
    pairs = (
        a.join(b.hint("merge"), "chunk_hash")
        .filter(F.col("ida") != F.col("idb"))
        .groupBy("ida", "idb", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(
            F.col("shared")
            >= F.lit(jaccard) * (F.col("na") + F.col("nb") - F.col("shared"))
        )
    )
    neigh = pairs.groupBy(F.col("ida").alias(id_col)).agg(
        F.min("idb").alias("min_neighbor"),
        (F.count(F.lit(1)) + 1).alias("group_size"),
    )
    # all-docs (id, payload_len): a map over the checkpointed proxy —
    # no UDF re-execution, no extra shuffle
    docs = per_doc.select(id_col, "payload_len")
    return (
        docs.join(neigh, id_col, "left")
        .select(
            id_col,
            "payload_len",
            F.least(F.coalesce("min_neighbor", F.col(id_col)),
                    F.col(id_col)).alias("dup_group"),
            F.coalesce("group_size", F.lit(1)).cast("long")
            .alias("group_size"),
        )
    )
