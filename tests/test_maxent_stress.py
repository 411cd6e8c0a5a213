"""MaxentStress layout (reference cpp/viz/MaxentStress.cpp via the
Gansner-Hu-North fixed-point): NumPy replica at exact-repulsion fixture
scale + stress improvement from a random start."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.graphlayout import maxent_stress, stress_value

EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (3, 4), (4, 5)]
N = 6


def _hash60(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 4


def _replica(edges, n, dim, rounds, alpha, q, cg_iters, seed):
    """Driver-side replica: same init hashes, exact repulsion over all
    non-adjacent pairs, same diag-preconditioned CG schedule."""
    adj = np.zeros((n, n))
    for u, v in edges:
        adj[u, v] = adj[v, u] = 1.0
    w = np.where(adj > 0, 1.0, 0.0)  # w_ij = 1/d^2, d = 1
    L = np.diag(w.sum(1)) - w
    d = w.sum(1)

    def cg(b):
        x = np.zeros(n)
        r = b.copy()
        p = np.where(d > 0, b / d, 0.0)
        rz = float(np.sum(np.where(d > 0, r * r / d, 0.0)))
        for _ in range(cg_iters):
            ap = L @ p
            pap = float(p @ ap)
            a = rz / pap if pap > 0 else 0.0
            x = x + a * p
            r = r - a * ap
            rzn = float(np.sum(np.where(d > 0, r * r / d, 0.0)))
            beta = rzn / rz if rz > 0 else 0.0
            rz = rzn
            p = np.where(d > 0, r / d, 0.0) + beta * p
        return x

    pos = np.array(
        [
            [
                _hash60(f"{i}:mx{k}:{seed}") / float(2 ** 60)
                for k in range(dim)
            ]
            for i in range(n)
        ]
    )
    eps = 1e-9
    for _ in range(rounds):
        b = np.zeros((n, dim))
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                diff = pos[i] - pos[j]
                dist = max(np.linalg.norm(diff), eps)
                if adj[i, j] > 0:
                    b[i] += diff / dist  # w d = 1
                else:
                    b[i] += alpha * diff / dist ** (q + 2.0)
        new = np.stack([cg(b[:, k]) for k in range(dim)], axis=1)
        pos = new - new.mean(0)
    return pos


def test_matches_numpy_replica_exact_repulsion(spark):
    g = Graph.from_edge_list(spark, EDGES, directed=False)
    out = maxent_stress(
        g, dim=2, rounds=3, alpha=0.01, cg_iters=5, exact_repulsion=True, seed=7
    )
    got = {r.node: (r.p0, r.p1) for r in out.collect()}
    # cg_iters stays BELOW the Krylov dimension (n=6): once CG converges
    # exactly, further iterations divide by a ~0 residual norm and amplify
    # float-summation-order noise chaotically on both sides
    want = _replica(EDGES, N, 2, 3, 0.01, 0.0, 5, 7)
    for v in range(N):
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-6), v
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-6), v


def test_stress_improves_from_random_start(spark):
    g = Graph.from_edge_list(spark, EDGES, directed=False)
    init = maxent_stress(g, rounds=0, seed=3).select("node", "p0", "p1")
    s0 = stress_value(g, init)
    out = maxent_stress(g, rounds=6, alpha=0.005, cg_iters=15, seed=3)
    s1 = stress_value(g, out.select("node", "p0", "p1"))
    assert s1 < s0 * 0.5, (s0, s1)


def test_sampled_repulsion_runs_and_spans(spark):
    g = Graph.from_edge_list(spark, EDGES, directed=False)
    out = maxent_stress(g, rounds=2, repulsion_samples=2, cg_iters=8, seed=1)
    rows = out.collect()
    assert len(rows) == N
    assert {"node", "p0", "p1", "x", "y"} <= set(out.columns)


def test_multilevel_maxent_refine(spark):
    import itertools
    import random

    from networkit_spark.operators.graphlayout import multilevel_layout

    rng = random.Random(4)
    edges = [
        (u, v)
        for u, v in itertools.combinations(range(90), 2)
        if rng.random() < 0.06
    ]
    g = Graph.from_edge_list(spark, edges, directed=False)
    out = multilevel_layout(g, n_thresh=16, max_iter=8, refine="maxent", maxent_rounds=2)
    assert {"node", "x", "y"} <= set(out.columns)
    assert out.count() == g.num_nodes()
