"""MatchingCoarsening + PseudoRandomSpanningTree parity tests."""

import hashlib

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import (
    local_max_matching,
    matching_coarsening,
)
from networkit_spark.operators.misc import pseudo_random_spanning_tree

EDGES = [(0, 1, 3.0), (1, 2, 2.0), (2, 3, 5.0), (3, 4, 1.0), (4, 5, 4.0),
         (5, 0, 2.5), (1, 4, 1.5), (2, 5, 3.5), (0, 3, 0.5)]


def _u(src, dst, seed):
    h = hashlib.md5(f"{src}:{dst}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) / float(2 ** 60)


def _kruskal_max(edges, n, seed):
    # canonical src<dst orientation, mirroring Graph.from_edge_list
    canon = [(min(u, v), max(u, v), w) for u, v, w in edges]
    perturbed = [
        (u, v, w + 1e-6 * (1.0 - 2.0 * _u(u, v, seed)), w) for u, v, w in canon
    ]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for u, v, pw, w in sorted(perturbed, key=lambda e: -e[2]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


def test_pseudo_random_spanning_tree(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=6)
    tree = pseudo_random_spanning_tree(g, seed=42)
    rows = {(r["src"], r["dst"], r["weight"]) for r in tree.collect()}
    assert rows == _kruskal_max(EDGES, 6, 42)
    assert len(rows) == 5  # spanning tree of a connected 6-node graph
    # different seed may pick a different tree but still spans
    tree7 = pseudo_random_spanning_tree(g, seed=7)
    assert tree7.count() == 5


def test_matching_coarsening(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=6)
    m = local_max_matching(g)
    m_rows = [(r["src"], r["dst"]) for r in m.collect()]
    assert m_rows  # non-empty matching on this graph
    cg, f2c = matching_coarsening(g, m)
    mapping = {r["node"]: r["coarse"] for r in f2c.collect()}
    # matched endpoints share a coarse node; unmatched map to themselves
    matched_nodes = {x for e in m_rows for x in e}
    for a, b in m_rows:
        assert mapping[a] == mapping[b] == a
    for v in set(range(6)) - matched_nodes:
        assert mapping[v] == v
    # coarse node count = n - |M|
    assert cg.num_nodes() <= 6 - len(m_rows)
    # total weight conserved (self-loops keep intra-pair weight)
    assert abs(
        cg.edges.agg(F.sum("weight")).collect()[0][0]
        - g.edges.agg(F.sum("weight")).collect()[0][0]
    ) < 1e-9
    # no_self_loops drops exactly the matched-pair internal weight
    cg2, _ = matching_coarsening(g, m, no_self_loops=True)
    internal = sum(
        w for u, v, w in EDGES
        if mapping[min(u, v)] == mapping[max(u, v)]
    )
    assert abs(
        (g.edges.agg(F.sum("weight")).collect()[0][0] - internal)
        - cg2.edges.agg(F.sum("weight")).collect()[0][0]
    ) < 1e-9
