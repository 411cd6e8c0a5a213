"""k-truss peel: golden small graphs + a brute-force replica sweep."""

from __future__ import annotations

import itertools
import random

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import k_truss


def _truss_replica(edges, k):
    """Driver-side reference peel (set arithmetic, the spec)."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for u, v in es:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(adj[u] & adj[v])
            for u, v in es
        }
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return es
        es -= drop


def _collect(df):
    return {(r.src, r.dst) for r in df.collect()}


def test_k5_is_5_truss(spark):
    k5 = list(itertools.combinations(range(5), 2))
    g = Graph.from_edge_list(spark, k5, directed=False)
    assert _collect(k_truss(g, 5)) == {tuple(e) for e in k5}
    assert _collect(k_truss(g, 6)) == set()


def test_triangle_with_pendant(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)], directed=False)
    assert _collect(k_truss(g, 3)) == {(0, 1), (0, 2), (1, 2)}


def test_peel_cascade(spark):
    # two triangles sharing edge (1,2): at k=4 the outer edges peel first,
    # then the shared edge loses all support — cascade to empty
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    assert _collect(k_truss(g, 3)) == {tuple(sorted(e)) for e in edges}
    assert _collect(k_truss(g, 4)) == set()


def test_k_truss_requires_k3(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        k_truss(g, 2)


def test_matches_replica_on_random_graph(spark):
    rng = random.Random(7)
    edges = [
        (u, v)
        for u, v in itertools.combinations(range(24), 2)
        if rng.random() < 0.3
    ]
    g = Graph.from_edge_list(spark, edges, directed=False)
    for k in (3, 4, 5, 6):
        assert _collect(k_truss(g, k)) == _truss_replica(edges, k), k


def test_deep_peel_cascade_strip(spark):
    # strip of triangles (i, i+1, i+2): at k=4 only the two end triangles
    # are under-supported initially, so the peel eats inward one triangle
    # per round from each side — a >=6-round cascade on 16 vertices —
    # exercising the support-decrement frontier loop well past one round
    n = 16
    edges = [(i, i + 1) for i in range(n - 1)] + [(i, i + 2) for i in range(n - 2)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    assert _collect(k_truss(g, 4)) == _truss_replica(edges, 4)
    assert _collect(k_truss(g, 3)) == _truss_replica(edges, 3)


def test_max_rounds_exhaustion_raises(spark):
    edges = [(i, i + 1) for i in range(10)] + [(i, i + 2) for i in range(9)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_truss(g, 4, max_rounds=1)


def test_decrement_path_equals_recompute_path(spark):
    # force each strategy explicitly: recompute_frac=1.1 pins the pure
    # support-decrement path, recompute_frac=0.0 pins full recompute every
    # round — identical trusses by the maintenance-exactness argument
    rng = random.Random(3)
    edges = [
        (u, v)
        for u, v in itertools.combinations(range(22), 2)
        if rng.random() < 0.35
    ]
    g = Graph.from_edge_list(spark, edges, directed=False)
    for k in (3, 4, 5):
        dec = _collect(k_truss(g, k, recompute_frac=1.1))
        rec = _collect(k_truss(g, k, recompute_frac=0.0))
        assert dec == rec == _truss_replica(edges, k), k
