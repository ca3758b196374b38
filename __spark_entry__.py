"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over streamprocess_spark.plans — every implemented operator
from SURVEY.md §2 is registered there as a QuerySpec carrying both the
Spark builder and (where SQL-expressible) the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from streamprocess_spark.plans import query_map

    return query_map()["q1_pricing_summary"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from streamprocess_spark.plans import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    from streamprocess_spark.plans import oracle_sql_map

    return oracle_sql_map()
