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


def test_self_loops_ignored(spark):
    edges = [(0, 1), (1, 2), (0, 2), (1, 1)]
    g = Graph.from_edge_list(spark, edges, num_nodes=3)
    assert triangle_count(g) == 1
