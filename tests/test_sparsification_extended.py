"""Tests for the round-2 sparsifier scores: ChanceCorrectedTriangleScore and
MultiscaleScore against pure-Python replicas of the reference formulas
(cpp/sparsification/ChanceCorrectedTriangleScore.cpp:22-29,
MultiscaleScore.cpp:24-65); ForestFireScore and RandomNodeEdgeScore via the
invariants that survive the documented distributed adaptation (determinism,
range, rank-permutation)."""

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.sparsification import (
    chance_corrected_triangle_score,
    forest_fire_score,
    multiscale_score,
    random_node_edge_score,
)

# weighted: two triangles (0,1,2) and (3,4,5) joined by bridge 2-3, leaf 6
EDGES = [
    (0, 1, 2.0), (0, 2, 1.0), (1, 2, 3.0),
    (2, 3, 1.0), (3, 4, 1.0), (4, 5, 2.0), (3, 5, 1.0), (5, 6, 1.0),
]


@pytest.fixture(scope="module")
def g(spark):
    return Graph.from_edge_list(spark, EDGES, weighted=True)


def _adj(edges):
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w
    return adj


def test_chance_corrected_triangle_replica(spark, g):
    adj = _adj(EDGES)
    n = len(adj)
    got = {(r.src, r.dst): r.score for r in chance_corrected_triangle_score(g).collect()}
    assert len(got) == len(EDGES)
    for u, v, _ in EDGES:
        t = len(set(adj[u]) & set(adj[v]))
        du, dv = len(adj[u]), len(adj[v])
        if t > 0:
            want = t * (n - 2) / ((du - 1) * (dv - 1))
        elif du == 1 or dv == 1:
            want = 1.0
        else:
            want = 0.0
        assert got[(min(u, v), max(u, v))] == pytest.approx(want)


def test_multiscale_replica(spark, g):
    adj = _adj(EDGES)
    got = {(r.src, r.dst): r.score for r in multiscale_score(g).collect()}
    assert len(got) == len(EDGES)
    for u, v, w in EDGES:
        best = 0.0
        for a, b in ((u, v), (v, u)):
            s = sum(adj[a].values())
            p = adj[a][b] / s
            k = len(adj[a])
            best = max(best, 1.0 - (1.0 - p) ** (k - 1))
        assert got[(min(u, v), max(u, v))] == pytest.approx(best)


def test_multiscale_leaf_is_zero_from_leaf_side(spark):
    # a star: every edge's score from the leaf side is 0 (k=1), from the hub
    # side 1-(1-1/4)^3 — the max must be the hub-side value
    star = Graph.from_edge_list(spark, [(0, i) for i in range(1, 5)])
    got = {(r.src, r.dst): r.score for r in multiscale_score(star).collect()}
    want = 1.0 - (1.0 - 0.25) ** 3
    assert all(v == pytest.approx(want) for v in got.values())


def test_forest_fire_deterministic_and_normalized(spark, g):
    a = {(r.src, r.dst): r.score for r in
         forest_fire_score(g, fires_per_wave=4, max_steps=4, seed=7).collect()}
    b = {(r.src, r.dst): r.score for r in
         forest_fire_score(g, fires_per_wave=4, max_steps=4, seed=7).collect()}
    assert a == b  # seeded-hash: same seed, same scores
    assert len(a) == len(EDGES)
    assert all(0.0 <= v <= 1.0 for v in a.values())
    assert max(a.values()) == pytest.approx(1.0)  # normalized by max burn count
    # the target ratio stopping rule actually burns edges
    assert sum(1 for v in a.values() if v > 0) >= len(EDGES) // 2


def test_random_node_edge_is_rank_permutation(spark, g):
    scores = sorted(
        r.score for r in random_node_edge_score(g, rne_ratio=0.5, seed=3).collect()
    )
    m = len(EDGES)
    assert scores == pytest.approx([i / m for i in range(m)])  # exact rank/m
    again = sorted(
        r.score for r in random_node_edge_score(g, rne_ratio=0.5, seed=3).collect()
    )
    assert scores == again


def test_random_node_edge_degree_bias(spark):
    # pure node-edge regime: a hub's edges race with much higher rates than a
    # long path's; the first-removed edge (score 0) should touch the hub far
    # more often than uniform across seeds
    edges = [(0, i) for i in range(1, 6)] + [(10 + i, 11 + i) for i in range(5)]
    gg = Graph.from_edge_list(spark, edges)
    hub_first = 0
    for seed in range(8):
        rows = random_node_edge_score(gg, rne_ratio=1.0, seed=seed).collect()
        first = min(rows, key=lambda r: r.score)
        hub_first += first.src == 0
    assert hub_first >= 5  # hub incident edges dominate the early removals


def test_linearize_score_replica(spark, g):
    from networkit_spark.operators.sparsification import linearize_score
    from pyspark.sql import functions as F

    scores = g.edges.select("src", "dst", F.col("weight").alias("score"))
    got = {(r.src, r.dst): r.score for r in linearize_score(scores).collect()}
    rows = sorted(
        ((w, min(u, v), max(u, v)) for u, v, w in EDGES)
    )
    m = len(rows)
    for pos, (_, u, v) in enumerate(rows):
        assert got[(u, v)] == pytest.approx(pos / (m - 1))
    inv = {(r.src, r.dst): r.score for r in linearize_score(scores, inverse=True).collect()}
    # descending score order, ties still ascending (src, dst)
    rows_inv = sorted(((-w, min(u, v), max(u, v)) for u, v, w in EDGES))
    for pos, (_, u, v) in enumerate(rows_inv):
        assert inv[(u, v)] == pytest.approx(pos / (m - 1))
    # single-edge special case -> 0.5
    single = spark.createDataFrame([(1, 2, 9.0)], "src long, dst long, score double")
    assert linearize_score(single).collect()[0].score == 0.5
