"""Skew mitigation for hot-key aggregation (SURVEY §2.13 scale notes,
M6 "salted keys where skewed").

At 100 TB a groupBy over a low-cardinality / power-law key (the
reference's 4 priority levels, 5 event types, per-label Prometheus
counters A13) sends each hot key's entire volume to ONE reducer. The
standard fix is two-stage salted aggregation:

  stage 1: groupBy(key, salt) — partial aggregates spread over
           n_salts reducers per hot key (map-side combine still
           applies);
  stage 2: groupBy(key) over the n_salts partials — tiny.

The salt must be deterministic (oracle / retry stability): hash of the
whole row mod n_salts, never rand(). For JOIN skew, AQE's
skewJoin (enabled in session.py) splits oversized partitions at
runtime — no manual salting needed there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name -> (stage1_agg_expr, stage2_combiner
    over the stage-1 column). Only algebraic aggregates (sum/count/
    min/max) decompose this way — exactly the ones the reference
    accumulates imperatively (A4/A5/A13).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    stage1 = df.withColumn("__salt", salt).groupBy(
        *key_cols, "__salt"
    ).agg(*[expr.alias(f"__s1_{name}") for name, (expr, _) in aggs.items()])
    return stage1.groupBy(*key_cols).agg(*[
        comb(F.col(f"__s1_{name}")).alias(name)
        for name, (_, comb) in aggs.items()
    ])


def salted_sum_count(
    df: DataFrame, key_cols: list[str], fixed_point_col: Column,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Salted count + order-independent fixed-point sum per key."""
    return salted_agg(
        df,
        key_cols,
        {
            "n_rows": (F.count(F.lit(1)), F.sum),
            "sum_fp": (F.sum(fixed_point_col), F.sum),
        },
        n_salts,
    )
