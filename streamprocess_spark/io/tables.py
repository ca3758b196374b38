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
    key = path.strip("/").replace("/", "_")
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


def table_path(sf_dir: str, name: str) -> str:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        path = _microsecond_copy(path)
    return path


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
