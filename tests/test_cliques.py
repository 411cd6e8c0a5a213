"""Maximal-clique enumeration (operators/cliques.py) vs an independent
brute-force reference (all subsets checked for completeness + maximality),
on fixtures chosen to hit every structural case: isolated vertices, pendant
edges, overlapping cliques, complete graphs."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.cliques import clique_number, max_clique, maximal_cliques


def brute_force_maximal_cliques(nodes, edges):
    es = {frozenset(e) for e in edges}
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def is_clique(s):
        return all(frozenset((a, b)) in es for a, b in combinations(s, 2))

    cliques = []
    ns = sorted(nodes)
    for r in range(1, len(ns) + 1):
        for s in combinations(ns, r):
            if is_clique(s):
                cliques.append(set(s))
    maximal = [
        c for c in cliques
        if not any(c < d for d in cliques)
    ]
    return sorted(sorted(c) for c in maximal)


def _g(spark, edges):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], ["src", "dst", "weight"]
    )
    return Graph(df, directed=False, weighted=True)


def _got(spark, edges, nodes=None):
    g = _g(spark, edges)
    rows = maximal_cliques(g).collect()
    return sorted([int(x) for x in r["clique"]] for r in rows)


CASES = {
    "triangle_plus_pendant": [(0, 1), (1, 2), (0, 2), (2, 3)],
    "two_overlapping_triangles": [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)],
    "k4": [(a, b) for a, b in combinations(range(4), 2)],
    "k5_minus_edge": [e for e in combinations(range(5), 2) if e != (0, 1)],
    "path4": [(0, 1), (1, 2), (2, 3)],
    "two_k3_sharing_vertex": [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)],
    "book_graph": [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (0, 4), (1, 4)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_fixture_graphs_match_brute_force(spark, name):
    edges = CASES[name]
    nodes = sorted({x for e in edges for x in e})
    expected = brute_force_maximal_cliques(nodes, edges)
    assert _got(spark, edges) == expected, name


def test_seeded_random_graph_matches_brute_force(spark):
    import hashlib

    n = 14
    edges = []
    for a, b in combinations(range(n), 2):
        h = int(hashlib.md5(f"cl|{a}|{b}".encode()).hexdigest()[:8], 16)
        if h % 100 < 35:  # p = 0.35
            edges.append((a, b))
    nodes = sorted({x for e in edges for x in e})
    expected = brute_force_maximal_cliques(nodes, edges)
    assert _got(spark, edges) == expected


def test_each_clique_reported_once_and_sorted(spark):
    edges = CASES["two_overlapping_triangles"]
    rows = maximal_cliques(_g(spark, edges)).collect()
    seen = [tuple(r["clique"]) for r in rows]
    assert len(seen) == len(set(seen))
    for c in seen:
        assert list(c) == sorted(c)
        assert len(c) == len(set(c))


def test_clique_number_and_max_clique(spark):
    g = _g(spark, CASES["k5_minus_edge"])
    assert clique_number(g) == 4
    best = max_clique(g).collect()
    assert sorted(tuple(int(x) for x in r["clique"]) for r in best) == [
        (0, 2, 3, 4), (1, 2, 3, 4),
    ]
