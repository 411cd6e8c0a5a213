"""NetworkX interchange roundtrips (reference networkit/nxadapter.py)."""

import pytest

networkx = pytest.importorskip("networkx")

from networkit_spark.graph import Graph
from networkit_spark.sources.nxadapter import from_networkx, to_networkx


def test_nx_roundtrip_undirected_weighted(spark):
    nxg = networkx.Graph()
    nxg.add_edge("a", "b", w=2.0)
    nxg.add_edge("b", "c", w=3.0)
    nxg.add_node("lonely")
    g = from_networkx(spark, nxg, weight_attr="w")
    assert g.num_nodes() == 4
    edges = {(r.src, r.dst): r.weight for r in g.edges.collect()}
    assert edges == {(0, 1): 2.0, (1, 2): 3.0}
    back = to_networkx(g)
    assert back.number_of_edges() == 2
    assert back[0][1]["weight"] == 2.0


def test_nx_roundtrip_directed(spark):
    nxg = networkx.DiGraph()
    nxg.add_edge(0, 1)
    nxg.add_edge(1, 0)
    nxg.add_edge(1, 2)
    g = from_networkx(spark, nxg)
    assert g.directed
    assert g.num_edges() == 3
    back = to_networkx(g)
    assert back.is_directed() and set(back.edges()) == {(0, 1), (1, 0), (1, 2)}


def test_graph_to_nx_pagerank_parity(spark):
    # networkx.pagerank needs scipy (absent in this container), so the parity
    # check uses a pure-Python power iteration over the to_networkx adjacency
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0)]
    g = Graph.from_edge_list(spark, edges)
    nxg = to_networkx(g)
    from networkit_spark.operators import pagerank

    ours = {r.node: r.score for r in pagerank(g, tol=1e-12).collect()}
    nodes = sorted(nxg.nodes())
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(500):
        nr = {
            v: 0.15 / n
            + 0.85 * sum(r[u] / nxg.degree(u) for u in nxg.neighbors(v))
            for v in nodes
        }
        s = sum(nr.values())
        r = {v: x / s for v, x in nr.items()}
    for v in nodes:
        assert ours[v] == pytest.approx(r[v], abs=1e-6)
