"""Cross-engine deterministic aggregation helpers.

Fixed-point sum pattern: ``sum(cast(floor(expr * 1e6) as bigint))``
then ONE int→double conversion at the end.

Why not plain double sums: fp addition is order-dependent, so Spark's
shuffle-parallel partial aggregation and DuckDB's sequential scan
differ in final ulps. Why not decimal sums: the double→decimal and
decimal→double casts are implemented differently per engine (shortest-
repr vs binary-expansion rounding) and diverge by ulps near rounding
boundaries. The fixed-point path has no ambiguity anywhere: the double
multiply is IEEE-identical given identical operands, floor is exact,
int64 sums are exact and order-independent, and int64→double is
correctly rounded in both engines.

Semantics: the aggregate is exactly ``sum(floor(x·1e6))/1e6`` — a
µ-precision truncating sum (bias < n·1e-6), documented engine
behavior, not an approximation of float summation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000.0


def fixed(col: Column | str) -> Column:
    """floor(x·1e6) as int64 — the deterministic fixed-point image."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(SCALE)).cast("bigint")


def dsum(col: Column | str, alias: str) -> Column:
    """Deterministic, order-independent sum of a double expr → double."""
    return (F.sum(fixed(col)).cast("double") / F.lit(SCALE)).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic mean: fixed-point sum / scale / count."""
    return (
        F.sum(fixed(col)).cast("double") / F.lit(SCALE) / F.count(F.lit(1))
    ).alias(alias)


def ts_sec(col: Column | str) -> Column:
    """Epoch seconds (double, µs fraction) of a timestamp column.
    Parquet NTZ timestamps can't cast straight to double; routing via
    timestamp_ltz is an identity under the pinned UTC session zone and
    matches DuckDB's epoch(ts)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")


def events_us_oracle(sql: str) -> str:
    """Rewrite an oracle that reads `events` to read a µs-truncated
    CTE instead. The raw table carries ns timestamps; Spark scans a
    µs-truncated staged copy, so the oracle must observe identical
    µs-precision event times (DuckDB's cast truncates, matching the
    pyarrow staging cast)."""
    if "events" not in sql:
        return sql
    body = sql.replace("FROM events", "FROM ev").replace("JOIN events", "JOIN ev")
    ev_cte = "ev AS (SELECT * REPLACE (cast(ts AS timestamp) AS ts) FROM events)"
    s = body.lstrip()
    if s.upper().startswith("WITH RECURSIVE"):
        # RECURSIVE must stay the first keyword of the WITH list
        return "WITH RECURSIVE " + ev_cte + ", " + s[len("WITH RECURSIVE"):].lstrip()
    if s.upper().startswith("WITH"):
        return "WITH " + ev_cte + ", " + s[4:].lstrip()
    return "WITH " + ev_cte + " " + s


def sql_dsum(expr: str, alias: str) -> str:
    return (
        f"cast(cast(sum(cast(floor(({expr}) * 1000000.0) AS bigint)) AS bigint)"
        f" AS double) / 1000000.0 AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"cast(cast(sum(cast(floor(({expr}) * 1000000.0) AS bigint)) AS bigint)"
        f" AS double) / 1000000.0 / count(*) AS {alias}"
    )
