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


_CHUNK_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("chunk_hash", T.LongType()),
    T.StructField("chunk_len", T.IntegerType()),
]))


def cdc_chunks_udf(min_size: int = 128, avg_size: int = 512,
                   max_size: int = 2048):
    @pandas_udf(_CHUNK_SCHEMA)
    def _udf(payload: pd.Series) -> pd.Series:
        def run(raw: bytes) -> list[dict]:
            raw = bytes(raw)
            return [
                {"chunk_hash": np_chunk_hash(raw[o:o + ln]), "chunk_len": ln}
                for o, ln in np_cdc_chunks(raw, min_size, avg_size, max_size)
            ]
        return payload.apply(run)
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
    caps) so no hash bucket can go quadratic."""
    ex = (
        chunked.select(
            F.col(id_col),
            # DISTINCT-hash count, not raw chunk count: `shared` below
            # counts distinct hashes, so both sides of the Jaccard
            # ratio must use set semantics — duplicate-counted chunks
            # (zero padding, repeated headers) would otherwise deflate
            # the ratio and miss true duplicates (round-4 advice)
            F.size(F.array_distinct(F.col("chunks.chunk_hash")))
            .cast("long").alias("n_chunks"),
            F.aggregate(
                "chunks", F.lit(0).cast("long"),
                lambda a, c: a + c["chunk_len"].cast("long"),
            ).alias("payload_len"),
            F.explode("chunks").alias("c"),
        )
        .select(id_col, "n_chunks", "payload_len",
                F.col("c.chunk_hash").alias("chunk_hash"))
        .distinct()                               # set semantics per doc
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
        a.join(b, "chunk_hash")
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
    docs = chunked.select(
        F.col(id_col),
        F.aggregate(
            "chunks", F.lit(0).cast("long"),
            lambda a_, c: a_ + c["chunk_len"].cast("long"),
        ).alias("payload_len"),
    )
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
