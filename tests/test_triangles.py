import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import (
    global_clustering_coefficient,
    local_clustering_coefficient,
    node_triangle_counts,
    triangle_count,
    triangle_edge_score,
)

from conftest import LCC16_EDGES, LCC16_EXPECTED
from reference_oracles import numpy_triangle_counts


def test_lcc_golden_16node(spark):
    """CentralityGTest.cpp:716-766 exact LCC vector."""
    g = Graph.from_edge_list(spark, LCC16_EDGES, num_nodes=16)
    got = {r["node"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    vec = [got[i] for i in range(16)]
    assert np.allclose(vec, LCC16_EXPECTED, atol=1e-12)


def test_node_triangle_counts(spark):
    g = Graph.from_edge_list(spark, LCC16_EDGES, num_nodes=16)
    got = {r["node"]: r["triangles"] for r in node_triangle_counts(g).collect()}
    exact = numpy_triangle_counts(LCC16_EDGES, 16)
    assert [got[i] for i in range(16)] == list(exact)


def test_global_triangle_count(spark):
    g = Graph.from_edge_list(spark, LCC16_EDGES, num_nodes=16)
    exact = numpy_triangle_counts(LCC16_EDGES, 16).sum() // 3
    assert triangle_count(g) == exact


def test_triangle_k4(spark):
    """K4: 4 triangles, every node LCC=1."""
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    g = Graph.from_edge_list(spark, k4, num_nodes=4)
    assert triangle_count(g) == 4
    lcc = {r["node"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    assert all(v == pytest.approx(1.0) for v in lcc.values())
    assert global_clustering_coefficient(g) == pytest.approx(1.0)


def test_triangle_edge_score(spark):
    """Each K4 edge lies in exactly 2 triangles (TriangleEdgeScore.cpp)."""
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    g = Graph.from_edge_list(spark, k4, num_nodes=4)
    scores = {(r["src"], r["dst"]): r["score"] for r in triangle_edge_score(g).collect()}
    assert all(v == 2 for v in scores.values()) and len(scores) == 6


def test_adjacency_method_matches_wedge(spark):
    """The array_intersect kernel enumerates the identical (a, b, c) set as
    the wedge-join kernel (same apex convention, same (b, c) id order)."""
    from networkit_spark.operators.triangles import triangles
    from networkit_spark.generators import rmat

    g16 = Graph.from_edge_list(spark, LCC16_EDGES, num_nodes=16)
    w = sorted(map(tuple, triangles(g16, method="wedge").collect()))
    a = sorted(map(tuple, triangles(g16, method="adjacency").collect()))
    assert w == a and len(w) > 0
    gr = rmat(spark, scale=9, edge_factor=6, seed=7)
    assert (
        triangles(gr, method="adjacency").count()
        == triangles(gr, method="wedge").count()
    )


def test_self_loops_ignored(spark):
    edges = [(0, 1), (1, 2), (0, 2), (1, 1)]
    g = Graph.from_edge_list(spark, edges, num_nodes=3)
    assert triangle_count(g) == 1


def test_avg_lcc_excludes_low_degree(spark):
    """avgLocal averages over degree>=2 nodes only
    (ClusteringCoefficient.cpp:120-124): triangle 0-1-2 plus pendant 3 on 0
    -> (1/3 + 1 + 1) / 3, the pendant excluded from the denominator."""
    from networkit_spark.operators.triangles import (
        average_local_clustering_coefficient,
    )

    edges = [(0, 1), (1, 2), (0, 2), (0, 3)]
    g = Graph.from_edge_list(spark, edges, num_nodes=4)
    assert average_local_clustering_coefficient(g) == pytest.approx(
        (1.0 / 3.0 + 1.0 + 1.0) / 3.0
    )


def test_approx_clustering_extremes(spark):
    """Every wedge of K5 closes; no wedge of a star closes."""
    from networkit_spark.operators.triangles import (
        approx_avg_local_clustering,
        approx_global_clustering,
    )

    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    g = Graph.from_edge_list(spark, k5, num_nodes=5)
    assert approx_avg_local_clustering(g) == pytest.approx(1.0)
    assert approx_global_clustering(g) == pytest.approx(1.0)
    star = [(0, i) for i in range(1, 8)]
    s = Graph.from_edge_list(spark, star, num_nodes=8)
    assert approx_avg_local_clustering(s) == pytest.approx(0.0)
    assert approx_global_clustering(s) == pytest.approx(0.0)


def test_approx_clustering_near_exact(spark):
    """One stratified trial per node on the 16-node fixture: the estimate
    lands within the binomial noise envelope of the exact values, and is
    deterministic across repeat runs (hash-seeded, not RNG)."""
    from networkit_spark.operators.triangles import (
        approx_avg_local_clustering,
        approx_global_clustering,
        average_local_clustering_coefficient,
        global_clustering_coefficient,
    )

    g = Graph.from_edge_list(spark, LCC16_EDGES, num_nodes=16)
    a1 = approx_avg_local_clustering(g, seed=42)
    a2 = approx_avg_local_clustering(g, seed=42)
    assert a1 == a2  # deterministic
    assert 0.0 <= a1 <= 1.0
    assert abs(a1 - average_local_clustering_coefficient(g)) < 0.45
    gl = approx_global_clustering(g, seed=42)
    assert 0.0 <= gl <= 1.0
    assert abs(gl - global_clustering_coefficient(g)) < 0.45


def test_gini_matches_reference_formula(spark):
    """functions/stats.gini vs a literal replica of the reference's
    _NetworKit.pyx:8879-8889 Lorenz-area loop."""
    from networkit_spark.functions.stats import gini

    def ref_gini(values):
        sorted_list = sorted(values)
        height, area = 0.0, 0.0
        for value in sorted_list:
            height += value
            area += height - value / 2.0
        fair_area = height * len(values) / 2.0
        return (fair_area - area) / fair_area

    vals = [3.0, 1.0, 7.0, 2.0, 2.0, 9.0, 1.0, 5.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "x"]
    )
    assert gini(df, "x", "id") == pytest.approx(ref_gini(vals), abs=1e-12)
    # uniform distribution -> 0
    eq = spark.createDataFrame([(i, 4.0) for i in range(6)], ["id", "x"])
    assert gini(eq, "x", "id") == pytest.approx(0.0, abs=1e-12)


def test_globals_clustering_branches(spark):
    """globals.py:7-21 clustering(G, error): exact branch under 100 nodes,
    stratified approx branch at or above."""
    from networkit_spark.operators.triangles import (
        average_local_clustering_coefficient,
        approx_avg_local_clustering,
        clustering,
    )
    from networkit_spark.generators import erdos_renyi

    small = erdos_renyi(spark, n=60, p=0.2, seed=7)
    assert clustering(small) == pytest.approx(
        average_local_clustering_coefficient(small), abs=1e-12
    )
    big = erdos_renyi(spark, n=300, p=0.05, seed=7)
    assert clustering(big) == pytest.approx(
        approx_avg_local_clustering(big, seed=42), abs=1e-12
    )
