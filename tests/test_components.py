from networkit_spark.graph import Graph
from networkit_spark.operators.components import (
    connected_components,
    component_sizes,
    extract_largest_component,
    num_components,
)

from conftest import CC20_EDGES, CC20_CANONICAL


def test_cc_golden_20node(spark):
    """ConnectedComponentsGTest.cpp:24-58: 5 components, node 15 isolated,
    compare via canonical min-member labels."""
    g = Graph.from_edge_list(spark, CC20_EDGES, num_nodes=20)
    labels = connected_components(g)
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == CC20_CANONICAL
    assert num_components(labels) == 5


def test_cc_same_component_assertions(spark):
    g = Graph.from_edge_list(spark, CC20_EDGES, num_nodes=20)
    got = {r["node"]: r["component"] for r in connected_components(g).collect()}
    assert got[0] == got[19]
    assert got[3] == got[7]
    assert got[15] == 15


def test_cc_without_pointer_jumping(spark):
    g = Graph.from_edge_list(spark, CC20_EDGES, num_nodes=20)
    got = {
        r["node"]: r["component"]
        for r in connected_components(g, pointer_jumping=False).collect()
    }
    assert got == CC20_CANONICAL


def test_cc_path_graph_pointer_jumping_fast(spark):
    """Pointer doubling converges in O(log n) on a path (diameter = n-1)."""
    n = 64
    path = [(i, i + 1) for i in range(n - 1)]
    g = Graph.from_edge_list(spark, path, num_nodes=n)
    labels = connected_components(g)
    assert labels._iterations <= 12  # ≪ 63 plain-propagation rounds
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert set(got.values()) == {0}


def test_component_sizes_and_largest(spark):
    g = Graph.from_edge_list(spark, CC20_EDGES, num_nodes=20)
    labels = connected_components(g)
    sizes = {r["component"]: r["size"] for r in component_sizes(labels).collect()}
    assert sizes == {0: 7, 3: 5, 10: 5, 13: 2, 15: 1}
    largest = extract_largest_component(g, labels)
    assert largest.num_edges() == 6  # the 7-node component's edges
