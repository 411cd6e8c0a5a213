import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank

from conftest import PR8_EDGES, PR8_EXPECTED, DPR5_EDGES
from reference_oracles import numpy_pagerank


def scores_vec(df, n):
    rows = {r["node"]: r["score"] for r in df.collect()}
    return np.array([rows.get(i, 0.0) for i in range(n)])


def test_pagerank_golden_8node(spark):
    """CentralityGTest.cpp:243-283 golden vector (reference compares 1e-4)."""
    g = Graph.from_edge_list(spark, PR8_EDGES, directed=False, weighted=True, num_nodes=8)
    got = scores_vec(pagerank(g, damp=0.85, tol=1e-9), 8)
    assert np.allclose(got, PR8_EXPECTED, atol=1e-4)
    # tight parity vs the exact numpy replica of the reference update rule
    exact = numpy_pagerank(PR8_EDGES, 8, directed=False)
    assert np.allclose(got, exact, atol=1e-6)


def test_pagerank_directed(spark):
    """FIXTURES.md §7 directed smoke: node 4 dangling-source, node 2 highest."""
    g = Graph.from_edge_list(spark, DPR5_EDGES, directed=True, num_nodes=5)
    got = scores_vec(pagerank(g, damp=0.85, tol=1e-10), 5)
    exact = numpy_pagerank(DPR5_EDGES, 5, directed=True, tol=1e-12)
    assert np.allclose(got, exact, atol=1e-6)
    assert got.argmax() == 2
    assert got.argmin() == 4  # no in-edges → teleport-only


def test_pagerank_fixed_iters_deterministic(spark):
    g = Graph.from_edge_list(spark, PR8_EDGES, weighted=True, num_nodes=8)
    a = scores_vec(pagerank(g, fixed_iters=12), 8)
    b = scores_vec(pagerank(g, fixed_iters=12), 8)
    assert np.array_equal(a, b)


def test_pagerank_isolated_nodes(spark):
    """Isolated nodes get pure teleport mass (normalized)."""
    g = Graph.from_edge_list(spark, [(0, 1)], num_nodes=4)
    got = scores_vec(pagerank(g, tol=1e-10), 4)
    exact = numpy_pagerank([(0, 1)], 4, tol=1e-12)
    assert np.allclose(got, exact, atol=1e-8)
    assert got[2] == pytest.approx(got[3])
    assert got.sum() == pytest.approx(1.0)
