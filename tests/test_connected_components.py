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


def test_stats_records_convergence_rounds(spark):
    """The soak's cc_rounds observability: `stats` receives the number
    of propagation rounds run (diameter-dependent, includes the final
    no-change confirm round) and results are unaffected."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], ["doc_a", "doc_b"]
    )
    stats: dict = {}
    rows = connected_components(df, stats=stats).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in rows} == {
        n: 1 for n in range(1, 7)
    }
    # a 6-node path has diameter 5; hash-min label propagation needs
    # several rounds but must converge well inside max_iter=25
    assert 2 <= stats["rounds"] <= 25


def _union_find_min_labels(edges):
    """Pure-python reference: min node id per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_random_graphs_match_union_find(spark):
    """Randomized differential check vs a sequential union-find —
    deterministic seeds, a spread of densities (sparse forests up to
    near-cliques) exercising multi-round propagation."""
    import random

    for seed, n_nodes, n_edges in [
        (1, 12, 6), (2, 20, 25), (3, 30, 12), (4, 8, 28), (5, 40, 40),
    ]:
        rng = random.Random(seed)
        edges = [
            tuple(sorted(rng.sample(range(n_nodes), 2)))
            for _ in range(n_edges)
        ]
        assert _cc(spark, edges) == _union_find_min_labels(edges), (
            f"seed={seed}"
        )
