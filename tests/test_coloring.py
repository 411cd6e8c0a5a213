"""Jones–Plassmann distributed coloring vs an exact sequential replica
(same md5 priorities, same schedule), plus proper-coloring invariants.
Covers reference networkit/coloring.py (SpectralColoring) semantics:
a proper coloring with a bounded palette."""

import hashlib

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.coloring import jones_plassmann_coloring

# sparse graph: two triangles, a bridge, a pendant and an isolated-ish tail
EDGES = [
    (0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
    (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
    (5, 6, 1.0), (6, 7, 1.0),
]


def _h(v, seed=42):
    return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)


def _replica(edges, seed=42):
    nodes = sorted({u for e in edges for u in e[:2]})
    adj = {v: set() for v in nodes}
    for u, v, _ in edges:
        adj[u].add(v)
        adj[v].add(u)
    pri = {v: (_h(v, seed), v) for v in nodes}
    uncolored, color = set(nodes), {}
    while uncolored:
        ready = [
            v for v in uncolored
            if all(pri[u] < pri[v] for u in adj[v] if u in uncolored)
        ]
        for v in ready:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        uncolored -= set(ready)
    return color


def test_jones_plassmann_matches_replica(spark):
    g = Graph.from_edge_list(spark, EDGES)
    got = {r.node: r.color for r in jones_plassmann_coloring(g).collect()}
    assert got == _replica(EDGES)
    # proper coloring, Δ+1 palette
    for u, v, _ in EDGES:
        assert got[u] != got[v]
    max_deg = max(
        sum(1 for e in EDGES if x in e[:2]) for x in {u for e in EDGES for u in e[:2]}
    )
    assert max(got.values()) <= max_deg


def test_jones_plassmann_seed_determinism(spark):
    g = Graph.from_edge_list(spark, EDGES)
    a = {r.node: r.color for r in jones_plassmann_coloring(g, seed=7).collect()}
    b = {r.node: r.color for r in jones_plassmann_coloring(g, seed=7).collect()}
    assert a == b
    assert a == _replica(EDGES, seed=7)
