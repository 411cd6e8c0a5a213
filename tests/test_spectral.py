"""SpectralPartitioner analog (reference networkit/partitioning.py:50-170 +
algebraic.py:201 laplacianEigenvectors): planted-bisection recovery, quantile
balance, eigenvector orthonormality/Rayleigh ordering, reference split
semantics (strict value < quantile, level-synchronous recursion)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.spectral import (
    laplacian_eigenvectors,
    spectral_partition,
)


def _planted(spark, seed=5, n=60, p_in=0.5, p_out=0.02):
    rng = random.Random(seed)
    edges = []
    for u in range(n):
        for v in range(u + 1, n):
            same = (u < n // 2) == (v < n // 2)
            if rng.random() < (p_in if same else p_out):
                edges.append((u, v, 1.0))
    return Graph.from_edge_list(spark, edges, weighted=True), n


def test_planted_bisection_recovery(spark):
    g, n = _planted(spark)
    lab = {r.node: r.part for r in spectral_partition(g, 2, iters=60).collect()}
    acc = max(
        sum(1 for v in range(n) if (lab[v] == 0) == (v < n // 2)),
        sum(1 for v in range(n) if (lab[v] == 1) == (v < n // 2)),
    ) / n
    assert acc >= 0.95


def test_quantile_balance_k4(spark):
    g, n = _planted(spark)
    sizes = (
        spectral_partition(g, 4, iters=60)
        .groupBy("part")
        .count()
        .collect()
    )
    by = {r.part: r["count"] for r in sizes}
    assert set(by) == {0, 1, 2, 3}
    # median splits keep each part within one node of n/4 (ties permitting)
    assert max(by.values()) - min(by.values()) <= 2


def test_eigenvectors_orthonormal_and_ordered(spark):
    g, n = _planted(spark, seed=9)
    ev = laplacian_eigenvectors(g, 2, iters=80).toPandas()
    v1 = ev[ev["order"] == 1].set_index("node")["value"]
    v2 = ev[ev["order"] == 2].set_index("node")["value"]
    assert abs((v1 ** 2).sum() - 1.0) < 1e-9
    assert abs((v2 ** 2).sum() - 1.0) < 1e-9
    assert abs(v1.sum()) < 1e-7  # deflated against the constant
    assert abs(v2.sum()) < 1e-7
    assert abs((v1 * v2).sum()) < 1e-6  # mutually orthogonal
    # Rayleigh quotients ordered: lambda(v1) <= lambda(v2)
    edges = {(r.src, r.dst): r.weight for r in g.edges.collect()}

    def rayleigh(v):
        return sum(w * (v[a] - v[b]) ** 2 for (a, b), w in edges.items())

    assert rayleigh(v1) <= rayleigh(v2) + 1e-9


def test_path_graph_fiedler_value(spark):
    # P_n Laplacian: lambda_2 = 2(1 - cos(pi/n)); power iteration converges
    n = 12
    g = Graph.from_edge_list(
        spark, [(i, i + 1, 1.0) for i in range(n - 1)], weighted=True
    )
    ev = laplacian_eigenvectors(g, 1, iters=300).toPandas()
    v = ev.set_index("node")["value"]
    lam = sum((v[i] - v[i + 1]) ** 2 for i in range(n - 1))
    want = 2 * (1 - math.cos(math.pi / n))
    assert abs(lam - want) < 1e-4
    # Fiedler vector of a path is monotone
    vals = [v[i] for i in range(n)]
    assert vals == sorted(vals) or vals == sorted(vals, reverse=True)


def test_trisect_and_unbalanced(spark):
    g, n = _planted(spark, seed=11)
    p3 = spectral_partition(g, 3, iters=40)
    assert p3.select("part").distinct().count() == 3
    pm = spectral_partition(g, 2, iters=40, balanced=False)
    assert pm.select("part").distinct().count() == 2
    assert pm.count() == n


def test_trivial_and_empty(spark):
    g = Graph.from_edge_list(spark, [(0, 1, 1.0)], weighted=True)
    p1 = spectral_partition(g, 1)
    assert {r.part for r in p1.collect()} == {0}
    ge = Graph.from_edge_list(spark, [], weighted=True)
    assert laplacian_eigenvectors(ge, 2, iters=5).count() == 0
