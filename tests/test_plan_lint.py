"""Plan lint: structural red flags checked across EVERY registered
batch query, not just hand-picked ones. The three classes of
scale-killers this catches:

  - CartesianProduct / BroadcastNestedLoopJoin: an O(n·m) join slipped
    in where an equi-join was intended (typo'd join condition, lost
    key column) — fine at sf0.001, fatal at 100 TB;
  - BatchEvalPython: a row-at-a-time Python UDF in the plan — every
    Python boundary in this engine must be Arrow-vectorized
    (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas);
  - InMemoryTableScan on the hot path is allowed only for iterative
    operators that checkpoint deliberately (connected components).

Streaming queries (`stream_*`) execute inside their builders and are
linted separately by their own tests."""

from __future__ import annotations

import pytest

from streamprocess_spark.plans import QUERIES, query_map
from streamprocess_spark.plans.registry import _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

# Documented exemptions — each is a BOUNDED pattern, not a scale bug:
#   - q48/q72: brute-force cosine scoring broadcasts the QUERY set
#     (≤10 vectors) against the corpus — replicating a constant-size
#     probe side to every partition is the correct exact-top-k plan;
#     corpus-side data never nest-loops against corpus-side data.
#   - q73: IVF coarse assignment broadcasts the CENTROID table
#     (constant n_centroids) to score each vector — same shape.
#   - q78: the native Python UDTF API is row-based by contract
#     (BatchEvalPythonUDTF); the query exists to cover that API. The
#     Arrow path for the same semantics is q56 (pandas-UDF + explode).
_ALLOWED_NESTED_LOOP = {
    "q48_embedding_topk",
    "q72_embedding_neardup",
    "q73_ann_ivf_topk",
}
_ALLOWED_ROW_PYTHON = {"q78_segment_udtf"}

_BATCH_QUERIES = sorted(
    n for n in QUERIES if not n.startswith("stream_")
)


def _plan(spark, name: str) -> str:
    df = query_map()[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_quadratic_joins_or_row_python(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in _ALLOWED_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    if name not in _ALLOWED_ROW_PYTHON:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_exemption_broadcast_side_is_the_small_side(spark):
    """The q48 nested loop must broadcast the bounded query set, never
    the corpus: the BroadcastNestedLoopJoin's build side has to sit
    under a BroadcastExchange fed by the vec_id<10 filter."""
    plan = _plan(spark, "q48_embedding_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastExchange" in plan
    assert "vec_id" in plan and "< 10" in plan.replace("(", " ").replace(")", " ")
