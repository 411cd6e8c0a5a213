"""UnionMaximumSpanningForest (ref cpp/graph/UnionMaximumSpanningForest.cpp)
vs a sequential union-find replica, and NeighborhoodFunctionHeuristic
(ref cpp/distance/NeighborhoodFunctionHeuristic.cpp) shape checks."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.distance import neighborhood_function_heuristic
from networkit_spark.operators.misc import union_maximum_spanning_forest

# weights with ties so multiple max spanning forests exist
EDGES = [
    (0, 1, 3.0), (1, 2, 3.0), (0, 2, 3.0),   # weight-3 triangle: all in UMSF
    (2, 3, 2.0),                              # bridge: in UMSF
    (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),   # weight-1 triangle: all in UMSF
    (0, 3, 1.0),                              # cycle edge dominated by 3.0/2.0 path
    (5, 6, 2.0),
]


def _umsf_replica(edges):
    """Edge is in some max spanning forest iff its endpoints are not
    connected using strictly heavier edges (processed weight-descending)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = {}
    for w in sorted({w for _, _, w in edges}, reverse=True):
        lvl = [(u, v) for u, v, ew in edges if ew == w]
        for u, v in lvl:
            out[(u, v)] = find(u) != find(v)
        for u, v in lvl:
            parent[find(u)] = find(v)
    return out


def test_umsf_matches_replica(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True)
    got = {
        (r.src, r.dst): r.in_umsf for r in union_maximum_spanning_forest(g).collect()
    }
    want = _umsf_replica(EDGES)
    assert len(got) == len(EDGES)
    canon = {(min(u, v), max(u, v)): x for (u, v), x in want.items()}
    assert got == canon
    # the dominated cycle edge is excluded, every bridge/tie edge included
    assert got[(0, 3)] is False
    assert got[(2, 3)] is True and got[(0, 1)] is True and got[(3, 4)] is True


def test_umsf_distinct_weights_equal_msf(spark):
    # all-distinct weights: UMSF == the unique maximum spanning forest (n-1 edges)
    edges = [(0, 1, 5.0), (1, 2, 4.0), (0, 2, 3.0), (2, 3, 2.0), (1, 3, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    got = {(r.src, r.dst): r.in_umsf for r in union_maximum_spanning_forest(g).collect()}
    assert sum(got.values()) == 3
    assert got[(0, 1)] and got[(1, 2)] and got[(2, 3)]
    assert not got[(0, 2)] and not got[(1, 3)]


def test_umsf_quantized_level_cap(spark):
    """max_levels below the distinct-weight count triggers equi-width
    quantization: the level loop is bounded, the ORIGINAL weights come back,
    and the marked set is a superset of the exact UMSF (in-bucket ties only
    ever ADD edges, never drop one)."""
    edges = [(0, 1, 5.0), (1, 2, 4.0), (0, 2, 3.0), (2, 3, 2.0), (1, 3, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    rows = union_maximum_spanning_forest(g, max_levels=2).collect()
    got = {(r.src, r.dst): (r.weight, r.in_umsf) for r in rows}
    assert {k: v[0] for k, v in got.items()} == {
        (0, 1): 5.0, (1, 2): 4.0, (0, 2): 3.0, (2, 3): 2.0, (1, 3): 1.0
    }
    exact = {
        (r.src, r.dst): r.in_umsf for r in union_maximum_spanning_forest(g).collect()
    }
    for k, v in exact.items():
        if v:
            assert got[k][1], f"exact-UMSF edge {k} lost under quantization"
    # buckets: floor((w-1)/2) capped -> {5,4,3}=1, {2,1}=0. In-bucket ties are
    # the superset effect: (1,3) shares bucket 0 with (2,3), so it is judged
    # BEFORE (2,3)'s merge lands and flips to True (exact run: False), and the
    # weight-3 cycle edge (0,2) ties with {5,4} and flips likewise.
    assert got[(1, 3)][1] is True and got[(0, 2)][1] is True


def test_neighborhood_function_heuristic(spark):
    # path 0-1-2-3: exact with all nodes sampled
    g = Graph.from_edge_list(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)])
    nf = neighborhood_function_heuristic(g, num_samples=4, seed=1)
    assert [h for h, _ in nf] == [1, 2, 3]
    assert nf[0][1] == 6          # 2m
    assert nf[-1][1] == 12        # n(n-1)
    assert nf[1][1] == 10         # pairs within dist 2: 6 + 4
    # monotone non-decreasing
    vals = [v for _, v in nf]
    assert vals == sorted(vals)
