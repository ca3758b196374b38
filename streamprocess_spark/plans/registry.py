"""Named query registry — the single source of truth for the
correctness gate.

Each QuerySpec binds:
  - a Spark builder ``(SparkSession, sf_dir) -> DataFrame``
  - an equivalent DuckDB oracle SQL string (or None for ops that are
    not SQL-expressible — custom stateful streaming etc.; the driver
    then records a weaker rows-only check)
  - the SURVEY.md §2 operator ids the query covers.

Cross-engine determinism rules every query obeys:
  - Floating aggregates use the decimal-sum pattern:
    ``cast(sum(cast(expr as decimal(27,8))) as double)``. Decimal sums
    are exact and order-independent, so Spark's partition-parallel
    aggregation and DuckDB's sequential one produce bit-identical
    doubles. Plain double sums would differ in final ulps.
  - Per-row arithmetic is done in double with the same textual shape in
    both engines (IEEE ops are deterministic given identical operands).
  - Ranking/top-k always carries a unique tie-break key (event_id /
    orderkey), never raw floats alone.
  - Aggregate/computed columns are aliased identically in both engines
    (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    covers: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    covers: tuple[str, ...] = (),
    doc: str = "",
    bench: bool = False,
):
    """Decorator: register a Spark query builder under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, covers=covers, doc=doc, bench=bench
        )
        return fn

    return wrap


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    from streamprocess_spark.plans.util import events_us_oracle

    _ensure_loaded()
    return {
        name: events_us_oracle(spec.oracle)
        for name, spec in QUERIES.items()
        if spec.oracle
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import all modules that register queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import streamprocess_spark.plans.relational  # noqa: F401
    import streamprocess_spark.plans.dataflow  # noqa: F401
    import streamprocess_spark.plans.analytic_windows  # noqa: F401
    import streamprocess_spark.plans.llm_pipeline  # noqa: F401
    import streamprocess_spark.plans.streaming_queries  # noqa: F401
    import streamprocess_spark.plans.stateful_queries  # noqa: F401
    import streamprocess_spark.plans.multimodal  # noqa: F401
    import streamprocess_spark.plans.scale_joins  # noqa: F401

    _LOADED = True
