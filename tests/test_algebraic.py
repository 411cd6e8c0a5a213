"""Laplacian-solve operators: effective resistance, commute time,
spanning-edge centrality (reference cpp/distance/CommuteTimeDistance.cpp,
cpp/centrality/SpanningEdgeCentrality.cpp)."""

import math

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.algebraic import (
    commute_time_distance,
    effective_resistance,
    laplacian_smooth,
    spanning_edge_centrality,
)


def _graph(spark, edges, weighted=False):
    df = spark.createDataFrame(
        [(u, v, float(w)) for u, v, *rest in [tuple(e) for e in edges]
         for w in [rest[0] if rest else 1.0]],
        "src long, dst long, weight double",
    )
    return Graph(df, directed=False, weighted=weighted)


def _er_map(df):
    return {(r["u"], r["v"]): r["resistance"] for r in df.collect()}


def test_path_graph_series_resistance(spark):
    # P4 path 0-1-2-3: resistances add in series.
    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    er = _er_map(effective_resistance(g, [(0, 3), (0, 1), (1, 2)], iters=100))
    assert er[(0, 3)] == pytest.approx(3.0, abs=5e-3)
    assert er[(0, 1)] == pytest.approx(1.0, abs=5e-3)
    assert er[(1, 2)] == pytest.approx(1.0, abs=5e-3)


def test_triangle_parallel_resistance(spark):
    # Triangle: adjacent pair = 1 Ω in parallel with 2 Ω series = 2/3.
    g = _graph(spark, [(0, 1), (1, 2), (0, 2)])
    er = _er_map(effective_resistance(g, [(0, 1)], iters=100))
    assert er[(0, 1)] == pytest.approx(2.0 / 3.0, abs=5e-3)


def test_effective_resistance_matches_pinv(spark):
    # Random connected graph vs dense pseudo-inverse.
    rng = np.random.RandomState(7)
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    for _ in range(14):
        u, v = (int(x) for x in rng.randint(0, n, 2))
        if u != v and (min(u, v), max(u, v)) not in [(min(a, b), max(a, b)) for a, b in edges]:
            edges.append((min(u, v), max(u, v)))
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = A[v, u] = 1.0
    L = np.diag(A.sum(1)) - A
    Lp = np.linalg.pinv(L)
    pairs = [(0, n - 1), (1, 5), (2, 9)]
    g = _graph(spark, edges)
    er = _er_map(effective_resistance(g, pairs, iters=120))
    for u, v in pairs:
        want = Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]
        assert er[(u, v)] == pytest.approx(want, rel=1e-2), (u, v)


def test_commute_time_scaling(spark):
    # C(u,v) = vol * R(u,v); P3 path, vol = 2m = 4.
    g = _graph(spark, [(0, 1), (1, 2)])
    row = commute_time_distance(g, [(0, 2)], iters=100).collect()[0]
    assert row["resistance"] == pytest.approx(2.0, abs=5e-3)
    assert row["commute_time"] == pytest.approx(8.0, abs=2e-2)


def test_weighted_resistance(spark):
    # Two parallel weighted edges ~ conductances add: w=2 and path w=1,1
    # between 0 and 1: R = 1 / (2 + 0.5) = 0.4.
    g = _graph(spark, [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0)], weighted=True)
    er = _er_map(effective_resistance(g, [(0, 1)], iters=100))
    assert er[(0, 1)] == pytest.approx(0.4, abs=5e-3)


def test_spanning_edge_centrality_tree_and_cycle(spark):
    # On a tree every edge has R = 1 (every spanning tree contains it).
    # On a C4 cycle every edge has R = 3/4. JL with q sign vectors is an
    # unbiased estimator; with deterministic hash signs we only check the
    # estimates are in a sane band and symmetric across the cycle's edges.
    tree = _graph(spark, [(0, 1), (1, 2), (1, 3)])
    sec = {
        (r["src"], r["dst"]): r["score"]
        for r in spanning_edge_centrality(tree, q=16, iters=100).collect()
    }
    for e in [(0, 1), (1, 2), (1, 3)]:
        assert sec[e] == pytest.approx(1.0, rel=0.6), e

    cyc = _graph(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    sec_c = {
        (r["src"], r["dst"]): r["score"]
        for r in spanning_edge_centrality(cyc, q=32, iters=100).collect()
    }
    mean = sum(sec_c.values()) / 4
    assert mean == pytest.approx(0.75, rel=0.4)


def test_laplacian_smooth_isolated_nodes_stay_zero(spark):
    edges = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    g = Graph(edges, num_nodes=4)  # nodes 2,3 isolated
    rhs = spark.createDataFrame([(0, 0, 1.0), (0, 1, -1.0)], "sys long, node long, b double")
    x = {r["node"]: r["x"] for r in laplacian_smooth(g, rhs, iters=50).collect()}
    assert x[2] == 0.0 and x[3] == 0.0
    assert x[0] - x[1] == pytest.approx(1.0, abs=1e-6)


def test_conjugate_gradient_matches_pinv(spark):
    """Diagonal-preconditioned CG (ConjugateGradient.h:68-106) reaches the
    pseudo-inverse answer to machine precision within n iterations, where
    the same budget of Jacobi sweeps is still ~1e-1 off — the reason
    method='cg' is the scale path for the Laplacian family."""
    edges = [
        (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 1.5),
        (0, 2, 0.5), (3, 4, 1.0), (4, 5, 2.5), (5, 0, 1.0),
    ]
    n = 6
    A = np.zeros((n, n))
    for u, v, w in edges:
        A[u, v] += w
        A[v, u] += w
    Lp = np.linalg.pinv(np.diag(A.sum(1)) - A)
    pairs = [(0, 3), (1, 5), (2, 4)]
    exact = {(u, v): Lp[u, u] + Lp[v, v] - 2 * Lp[u, v] for u, v in pairs}

    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    g = Graph(df, weighted=True)
    got = {
        (r["u"], r["v"]): r["resistance"]
        for r in effective_resistance(g, pairs, iters=12, method="cg").collect()
    }
    for p in pairs:
        assert got[p] == pytest.approx(exact[p], abs=1e-10), p

    jac = {
        (r["u"], r["v"]): r["resistance"]
        for r in effective_resistance(g, pairs, iters=12, method="jacobi").collect()
    }
    assert max(abs(jac[p] - exact[p]) for p in pairs) > 1e-3


def test_conjugate_gradient_early_exit(spark):
    """With a positive tolerance CG stops once every system's relative
    residual is under tol (ConjugateGradient.h:72) — result still correct."""
    from networkit_spark.operators.algebraic import conjugate_gradient

    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])  # path: R(0,3)=3
    rhs = spark.createDataFrame(
        [(0, 0, 1.0), (0, 3, -1.0)], "sys long, node long, b double"
    )
    x = {r["node"]: r["x"] for r in conjugate_gradient(g, rhs, iters=50, tol=1e-8).collect()}
    assert x[0] - x[3] == pytest.approx(3.0, abs=1e-6)
