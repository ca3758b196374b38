"""Parquet table loaders for the analytic substrate.

Scans stay declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown, column pruning, and partition pruning for free —
verify with ``df.explain("formatted")``: filters on these tables must
appear as PushedFilters and projections must shrink ReadSchema.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from streamprocess_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are bounded by geography; supplier/part/customer are
# broadcastable at test SFs but NOT at 100 TB — joins against them must
# rely on autoBroadcastJoinThreshold + AQE, not a hard-coded hint).
ALWAYS_BROADCAST = ("region", "nation")


def _microsecond_copy(path: str) -> str:
    """Spark cannot scan TIMESTAMP(NANOS) parquet. Stage a one-time
    microsecond-precision copy (driver data is µs-grained, so the cast
    is lossless) into a shared temp cache and scan that — native
    TimestampType scans keep predicate pushdown."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    needs_cast = any(
        pa.types.is_timestamp(f.type) and f.type.unit == "ns" for f in schema
    )
    if not needs_cast:
        return path

    cache_dir = os.path.join(tempfile.gettempdir(), "spark_graft_us_cache")
    os.makedirs(cache_dir, exist_ok=True)
    # path digest closes the '_'-vs-'/' flattening collision (the same
    # class the round-9 advice flagged on _rowgroup_copy's key)
    import hashlib

    key = "{}.{}".format(
        path.strip("/").replace("/", "_"),
        hashlib.md5(path.encode()).hexdigest()[:8],
    )
    cached = os.path.join(cache_dir, key)
    src_mtime = os.path.getmtime(path)
    if os.path.exists(cached) and os.path.getmtime(cached) >= src_mtime:
        return cached

    table = pq.read_table(path)
    fields = [
        pa.field(f.name, pa.timestamp("us"))
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        else f
        for f in schema
    ]
    # safe=False truncates sub-µs digits — DuckDB's ns→µs cast truncates
    # identically, so both engines observe the same event times
    table = table.cast(pa.schema(fields), safe=False)
    tmp = cached + f".tmp{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, cached)
    return cached


# Minimum rows per re-chunked row group: tables smaller than
# 2 * _MIN_ROWS_PER_GROUP are left alone (region/nation/supplier — no
# parallelism to win), and no staged group is smaller than this (a
# 500-row sf0.001 table becomes ~4 groups, not 32 slivers).
_MIN_ROWS_PER_GROUP = 128


def _rowgroup_copy(path: str) -> str:
    """Stage a multi-row-group copy of a single-row-group fixture file.

    Round-8 scale finding: the fixture parquets (and the bench's
    DuckDB-generated deep/soak upscales) are written as ONE row group
    per file. Spark plans byte-range splits, but a parquet row group is
    assigned to the split containing its midpoint — so however many
    partitions the scan shows, every row lands in one task and the
    WHOLE scan-stage pipeline above it (Arrow UDF synthesis/decode,
    shingle explode + md5, map-side partial aggregation) ran on 1 core
    of 32 (measured: q135's map stage 82 s -> the same work in ~4 s
    once split). A real 100 TB layout is thousands of files x ~128 MB
    row groups — re-chunking the local fixture to
    ceil(rows / defaultParallelism) rows per group (floor 128) is what
    makes local[32] exercise the SAME parallel plan a cluster gets;
    content, values, and the DuckDB oracle's view of the raw file are
    untouched. Cached by source mtime, the _microsecond_copy pattern."""
    import math

    import pyarrow.parquet as pq

    from streamprocess_spark.session import default_parallelism

    meta = pq.read_metadata(path)
    rows = meta.num_rows
    if rows < 2 * _MIN_ROWS_PER_GROUP:
        return path
    target = max(
        _MIN_ROWS_PER_GROUP, math.ceil(rows / default_parallelism())
    )
    if meta.num_row_groups >= math.ceil(rows / target):
        return path  # already chunked at least this fine

    cache_dir = os.path.join(tempfile.gettempdir(), "spark_graft_rg_cache")
    os.makedirs(cache_dir, exist_ok=True)
    # Key by the computed row-group target too (it depends on
    # default_parallelism, so a different SPARK_GRAFT_CPUS against a
    # shared temp dir must not serve a copy chunked for the old
    # parallelism), and by a digest of the full source path (the
    # flattened form alone collides for paths differing only by
    # '_' vs '/').
    import hashlib

    key = "{}.{}.rg{}".format(
        path.strip("/").replace("/", "_"),
        hashlib.md5(path.encode()).hexdigest()[:8],
        target,
    )
    cached = os.path.join(cache_dir, key)
    if os.path.exists(cached) and os.path.getmtime(cached) >= os.path.getmtime(path):
        return cached
    table = pq.read_table(path)
    tmp = cached + f".tmp{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=target)
    os.replace(tmp, cached)
    return cached


def table_path(sf_dir: str, name: str) -> str:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        path = _microsecond_copy(path)
    return _rowgroup_copy(path)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    # Session-level scan catalog, stored ON the session object so its
    # lifetime is exactly the session's. `spark.read.parquet` costs a
    # JVM round-trip + footer/schema read per table (~80 ms x 10
    # tables), which dominated every query's plan-build time when paid
    # per call. Tables are immutable inputs and a scan DataFrame is a
    # reusable logical plan (each query derives its own children from
    # it), so register once per session like any catalog would —
    # keyed by resolved directory; never invalidated mid-session
    # because a given sf dir's data never mutates in place.
    catalog = getattr(spark, "_spark_graft_catalog", None)
    if catalog is None:
        catalog = {}
        spark._spark_graft_catalog = catalog
    # staleness guard: key on the source files' mtimes too (10 stat
    # calls, microseconds), so regenerating an sf dir in place within
    # one session invalidates the memoized scans instead of serving
    # DataFrames over a vanished file listing
    key = (
        os.path.abspath(sf_dir),
        tuple(
            os.path.getmtime(os.path.join(sf_dir, f"{n}.parquet"))
            if os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))
            else None
            for n in TABLE_NAMES
        ),
    )
    cached = catalog.get(key)
    if cached is not None:
        return dict(cached)
    # pandas-UDF closures downstream reference this package; make sure
    # executors can import it regardless of the driver's cwd/deployment
    # (idempotent per session, no-op cost after the first call)
    from streamprocess_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    dfs = {
        name: spark.read.parquet(table_path(sf_dir, name))
        for name in TABLE_NAMES
    }
    catalog[key] = dfs
    return dict(dfs)


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views for spark.sql use."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
