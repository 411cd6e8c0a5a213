"""Uniform random spanning forest (Wilson via Propp-Wilson cycle popping):
structural invariants + an empirical uniformity check on a graph whose
spanning trees are enumerable by hand (reference parity target:
cpp/graph/RandomSpanningForest.cpp — uniform distribution over spanning
trees; the repo deviation notes are in the operator docstring)."""

from __future__ import annotations

import itertools
import random

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components, num_components
from networkit_spark.operators.misc import random_spanning_forest


def _collect(df):
    return {(r.src, r.dst) for r in df.collect()}


def test_forest_invariants_random_graph(spark):
    rng = random.Random(11)
    edges = [
        (u, v)
        for u, v in itertools.combinations(range(20), 2)
        if rng.random() < 0.2
    ] + [(30, 31)]  # extra small component
    g = Graph.from_edge_list(spark, edges, directed=False)
    n = g.num_nodes()
    c = num_components(connected_components(g))
    forest = _collect(random_spanning_forest(g, seed=5))
    # spanning forest: n - c edges, same component structure, subset of E
    assert len(forest) == n - c
    assert forest <= {tuple(sorted(e)) for e in edges}
    fg = Graph.from_edge_list(spark, sorted(forest), directed=False)
    # forest spans: same number of components over the same node set
    labels = {r.node: r.component for r in connected_components(g).collect()}
    flabels = {r.node: r.component for r in connected_components(fg).collect()}
    for u, v in forest:
        assert labels[u] == labels[v]
    groups = {}
    for node, comp in flabels.items():
        groups.setdefault(comp, set()).add(node)
    fg_sizes = sorted(len(s) for s in groups.values() if len(s) > 1)
    g_groups = {}
    for node, comp in labels.items():
        g_groups.setdefault(comp, set()).add(node)
    g_sizes = sorted(len(s) for s in g_groups.values() if len(s) > 1)
    assert fg_sizes == g_sizes


def test_uniform_over_triangle_trees(spark):
    # K3 has exactly 3 spanning trees (drop any one edge); Wilson must hit
    # each with probability 1/3 — with 24 seeds each tree should appear
    # >= 3 times (P[Binomial(24, 1/3) <= 2] ~ 0.4%)
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], directed=False)
    seen = {}
    for s in range(24):
        t = frozenset(_collect(random_spanning_forest(g, seed=s)))
        assert len(t) == 2
        seen[t] = seen.get(t, 0) + 1
    assert len(seen) == 3, seen
    assert all(v >= 3 for v in seen.values()), seen
