"""connected_components unit tests on hand-built graphs — the parity
test (q86) covers the LSH-integrated path; these cover the operator's
own contract: multi-round convergence on long chains, component
separation, and symmetry (input direction must not matter)."""

from __future__ import annotations

from streamprocess_spark.operators.dedup import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = connected_components(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_chain_needs_multiple_rounds(spark):
    # path graph 1-2-3-4-5-6: hash-min needs ~diameter rounds; all
    # nodes must still collapse to label 1
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    assert labels == {n: 1 for n in range(1, 7)}


def test_disjoint_components_stay_separate(spark):
    labels = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert labels[10] == labels[11] == labels[12] == 10
    assert labels[20] == labels[21] == 20
    assert labels[30] == labels[31] == 30


def test_edge_direction_is_irrelevant(spark):
    # same component given in "wrong" (descending) direction
    labels = _cc(spark, [(5, 1), (5, 3), (3, 2)])
    assert labels == {1: 1, 2: 1, 3: 1, 5: 1}
