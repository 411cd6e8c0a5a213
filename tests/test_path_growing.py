"""PathGrowingMatcher (reference cpp/matching/PathGrowingMatcher.cpp,
MatcherGTest.cpp:86-104): proper matching, clique size n/2, and the
Hougardy-Drake ½-of-optimum weight guarantee vs a brute-force optimum."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import (
    is_proper_matching,
    matching_weight,
    path_growing_matching,
)


def _brute_force_opt(edges):
    """Exact max-weight matching by branch-and-bound over the edge list."""
    edges = sorted(edges, key=lambda e: -e[2])

    def rec(i, used, acc):
        if i == len(edges):
            return acc
        best = rec(i + 1, used, acc)
        u, v, w = edges[i]
        if u not in used and v not in used:
            best = max(best, rec(i + 1, used | {u, v}, acc + w))
        return best

    return rec(0, frozenset(), 0.0)


def test_pga_clique_perfect(spark):
    """MatcherGTest testPgaMatching: on a clique the matching is proper and
    perfect (n/2 edges). 16-clique instead of the reference's 50 for test
    wall-time — growth is one round per path edge."""
    n = 16
    edges = [(u, v, 1.0) for u in range(n) for v in range(u + 1, n)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    m = path_growing_matching(g)
    assert is_proper_matching(m)
    assert m.count() == n // 2


def test_pga_weighted_path_exact(spark):
    # path with weights 1,9,1: heavier class is the middle edge alone
    g = Graph.from_edge_list(
        spark, [(0, 1, 1.0), (1, 2, 9.0), (2, 3, 1.0)], weighted=True
    )
    m = {(r.src, r.dst): r.weight for r in path_growing_matching(g).collect()}
    assert m == {(1, 2): 9.0}


def test_pga_two_components(spark):
    # two disjoint triangles with distinct weights: per-path heavier class
    edges = [
        (0, 1, 5.0), (1, 2, 3.0), (0, 2, 1.0),
        (10, 11, 7.0), (11, 12, 6.0), (10, 12, 2.0),
    ]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    m = path_growing_matching(g)
    assert is_proper_matching(m)
    got = {(r.src, r.dst) for r in m.collect()}
    # each triangle contributes exactly one matched edge incl. its heaviest-
    # or-second edge; weight must beat half the brute-force optimum
    assert matching_weight(m) >= 0.5 * _brute_force_opt(edges)
    assert len(got) == 2


@pytest.mark.parametrize("seed", [3, 11])
def test_pga_half_approx_random(spark, seed):
    import random

    rng = random.Random(seed)
    n = 12
    edges = []
    seen = set()
    for _ in range(26):
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        edges.append((min(u, v), max(u, v), round(rng.uniform(0.5, 10.0), 3)))
    g = Graph.from_edge_list(spark, edges, weighted=True)
    m = path_growing_matching(g)
    assert is_proper_matching(m)
    opt = _brute_force_opt(edges)
    assert matching_weight(m) >= 0.5 * opt


def test_pga_grown_components_are_paths(spark):
    """Structural invariant of the concurrent formulation: every vertex has
    degree <= 2 in the matching's source forest — checked indirectly: the
    returned matching never repeats a vertex and self-loops are ignored."""
    edges = [(0, 0, 99.0), (0, 1, 2.0), (1, 2, 3.0), (2, 0, 4.0), (2, 3, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    m = path_growing_matching(g)
    assert is_proper_matching(m)
    assert all(r.src != r.dst for r in m.collect())


@pytest.mark.parametrize("seed", [3, 11])
def test_pga_hash_tiebreak_half_approx(spark, seed):
    """tie_break='hash' (the tie-heavy-graph scale mode) permutes only
    equal-weight edges in the total order — still a strict total order, so
    every invariant (proper matching, 1/2-approximation) must hold."""
    import random

    rng = random.Random(seed)
    n = 12
    edges = []
    seen = set()
    for _ in range(26):
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        # coarse weights -> many ties, exercising the hash order
        edges.append((min(u, v), max(u, v), float(rng.randrange(1, 4))))
    from networkit_spark.operators.matching import path_growing_matching

    g = Graph.from_edge_list(spark, edges, weighted=True)
    m = path_growing_matching(g, tie_break="hash")
    assert is_proper_matching(m)
    assert matching_weight(m) >= 0.5 * _brute_force_opt(edges)


def test_pga_hash_tiebreak_deterministic(spark):
    edges = [(u, v, 1.0) for u in range(8) for v in range(u + 1, 8)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    a = sorted(
        (r.src, r.dst) for r in path_growing_matching(g, tie_break="hash").collect()
    )
    b = sorted(
        (r.src, r.dst) for r in path_growing_matching(g, tie_break="hash").collect()
    )
    assert a == b and len(a) >= 1
