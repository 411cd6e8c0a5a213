"""Max-flow / min-cut / cut-clustering vs the reference's own fixtures.

Ports cpp/flow/test/EdmondsKarpGTest.cpp verbatim (P1, TwoPaths, P2,
Unconnected) and cross-checks cut_clustering against a sequential replica of
cpp/community/CutClustering.cpp semantics (tests/reference_oracles.py)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.flow import (
    cut_clustering,
    edmonds_karp,
    max_flow_value,
    min_st_cut,
)
from tests.reference_oracles import python_edmonds_karp

P1_EDGES = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 4), (2, 3), (2, 4), (3, 4),
    (3, 5), (4, 6), (5, 6),
]

TWO_PATHS_EDGES = [
    (0, 1), (0, 2), (2, 3), (3, 4), (1, 4), (1, 5), (5, 6), (6, 7),
    (7, 8), (8, 9), (4, 10), (9, 10),
]

P2_EDGES = [
    (0, 1, 5.0), (0, 2, 15.0), (1, 3, 5.0), (1, 4, 5.0), (2, 3, 5.0),
    (2, 4, 5.0), (3, 5, 15.0), (4, 5, 5.0),
]

UNCONNECTED_EDGES = [
    (0, 1, 5.0), (0, 2, 15.0), (1, 2, 5.0), (3, 4, 5.0), (3, 5, 15.0),
    (4, 5, 5.0),
]


def test_edmonds_karp_p1(spark):
    """EdmondsKarpGTest.cpp testEdmondsKarpP1: flow 2, forced sink arcs,
    source set {0..4}."""
    g = Graph.from_edge_list(spark, P1_EDGES, weighted=False, num_nodes=7)
    res = edmonds_karp(g, 0, 6)
    assert res.flow_value == pytest.approx(2.0)
    flows = {(r["u"], r["v"]): r["flow"] for r in res.flows().collect()}
    assert flows.get((4, 6), 0.0) == pytest.approx(1.0)
    assert flows.get((5, 6), 0.0) == pytest.approx(1.0)
    src_side = {r["node"] for r in res.source_set.collect()}
    assert src_side == {0, 1, 2, 3, 4}


def test_edmonds_karp_two_paths(spark):
    """testEdmondsKarpTwoPaths: flow 2 and edge (1,4) carries none."""
    g = Graph.from_edge_list(spark, TWO_PATHS_EDGES, weighted=False, num_nodes=11)
    res = edmonds_karp(g, 0, 10)
    assert res.flow_value == pytest.approx(2.0)
    flows = {(r["u"], r["v"]): r["flow"] for r in res.flows().collect()}
    assert flows.get((1, 4), 0.0) == pytest.approx(0.0)
    assert flows.get((4, 1), 0.0) == pytest.approx(0.0)


def test_edmonds_karp_p2_weighted(spark):
    """testEdmondsKarpP2: weighted, flow 15."""
    g = Graph.from_edge_list(spark, P2_EDGES, weighted=True, num_nodes=6)
    assert max_flow_value(g, 0, 5) == pytest.approx(15.0)


def test_edmonds_karp_unconnected(spark):
    """testEdmondsKarpUnconnected: sink unreachable, flow 0."""
    g = Graph.from_edge_list(spark, UNCONNECTED_EDGES, weighted=True, num_nodes=6)
    res = edmonds_karp(g, 0, 5)
    assert res.flow_value == pytest.approx(0.0)
    src_side = {r["node"] for r in res.source_set.collect()}
    assert src_side == {0, 1, 2}


def test_min_cut_matches_sequential_replica(spark):
    """min-cut value + minimal source side equal the sequential reference
    replica on an asymmetric weighted graph."""
    edges = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 1.0), (1, 3, 2.0), (2, 4, 2.0),
        (3, 4, 1.0), (3, 5, 2.0), (4, 5, 3.0), (2, 3, 1.0),
    ]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=6)
    res = edmonds_karp(g, 0, 5)
    ref_val, ref_set = python_edmonds_karp(edges, 6, 0, 5)
    assert res.flow_value == pytest.approx(ref_val)
    assert {r["node"] for r in res.source_set.collect()} == set(ref_set)
    cut_side = {r["node"] for r in min_st_cut(g, 0, 5).collect()}
    assert cut_side == set(ref_set)


def _replica_cut_clustering(edges, n, alpha):
    """Sequential CutClustering.cpp:16-80 replica over the local flow."""
    t = n
    aug = [(u, v, w) for u, v, w in edges] + [(u, t, alpha) for u in range(n)]
    deg = [0] * n
    for u, v, _ in edges:
        deg[u] += 1
        deg[v] += 1
    assigned = {}
    for u in sorted(range(n), key=lambda x: (-deg[x], x)):
        if u in assigned:
            continue
        _, src_set = python_edmonds_karp(aug, n + 1, u, t)
        for v in src_set:
            assigned[v] = u
    return assigned


def test_cut_clustering_two_cliques(spark):
    """Two 4-cliques bridged by one edge split into the planted clusters and
    exactly match the sequential reference replica."""
    clique_a = [(a, b, 1.0) for a in range(4) for b in range(a + 1, 4)]
    clique_b = [(a, b, 1.0) for a in range(4, 8) for b in range(a + 1, 8)]
    edges = clique_a + clique_b + [(3, 4, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=8)

    got = {
        r["node"]: r["cluster"] for r in cut_clustering(g, alpha=0.6).collect()
    }
    ref = _replica_cut_clustering(edges, 8, 0.6)
    assert got == ref
    # planted structure recovered: the bridge does not merge the cliques
    assert len({got[v] for v in range(4)}) == 1
    assert len({got[v] for v in range(4, 8)}) == 1
    assert got[0] != got[7]


def test_cut_clustering_hierarchy_two_triangles(spark):
    """getClusterHierarchy (CutClustering.cpp:83-238) on two bridged
    triangles: hierarchy runs from the whole component (alpha=0) through the
    two-triangle split to singletons, every level nested in the previous and
    equal to the sequential replica at its alpha."""
    from networkit_spark.operators.flow import cut_clustering_hierarchy

    edges = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0),
             (3, 4, 1.0), (3, 5, 1.0), (4, 5, 1.0), (2, 3, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=6)
    hier = cut_clustering_hierarchy(g)

    alphas = sorted(hier)
    assert alphas[0] == 0.0
    # level 0: single connected component, rep = min node
    assert set(hier[0.0].values()) == {0}

    # some level splits into exactly the two triangles
    tri_levels = [
        a for a in alphas
        if sorted(
            tuple(sorted(k for k, v in hier[a].items() if v == c))
            for c in set(hier[a].values())
        ) == [(0, 1, 2), (3, 4, 5)]
    ]
    assert tri_levels, f"no two-triangle level in {hier}"

    # highest level: all singletons
    top = hier[alphas[-1]]
    assert all(k == v for k, v in top.items())

    # nestedness: for increasing alpha every cluster is a subset of some
    # lower-alpha cluster
    for lo, hi in zip(alphas, alphas[1:]):
        lo_of = hier[lo]
        for c in set(hier[hi].values()):
            members = {k for k, v in hier[hi].items() if v == c}
            assert len({lo_of[m] for m in members}) == 1

    # every positive-alpha level reproduces the sequential replica
    for a in alphas:
        if a <= 0:
            continue
        ref = _replica_cut_clustering(edges, 6, a)
        got_parts = sorted(
            tuple(sorted(k for k, v in hier[a].items() if v == c))
            for c in set(hier[a].values())
        )
        ref_parts = sorted(
            tuple(sorted(k for k, v in ref.items() if v == c))
            for c in set(ref.values())
        )
        assert got_parts == ref_parts, a


# --- push-relabel (scale path, round-2 verdict item #7) ---------------------

def test_push_relabel_matches_ek_on_fixtures(spark):
    """Same flow value and identical (unique) min-cut source side as
    Edmonds-Karp on the reference fixtures — no per-augmentation driver
    round-trips in the push-relabel path."""
    from networkit_spark.operators.flow import push_relabel

    cases = [
        (P1_EDGES, False, 7, 0, 6, 2.0, {0, 1, 2, 3, 4}),
        (P2_EDGES, True, 6, 0, 5, 15.0, None),
        (UNCONNECTED_EDGES, True, 6, 0, 5, 0.0, {0, 1, 2}),
    ]
    for edges, weighted, n, s, t, want_flow, want_set in cases:
        g = Graph.from_edge_list(spark, edges, weighted=weighted, num_nodes=n)
        res = push_relabel(g, s, t)
        assert res.flow_value == pytest.approx(want_flow), edges
        got_set = {r["node"] for r in res.source_set.collect()}
        if want_set is not None:
            assert got_set == want_set, edges
        else:
            ek = edmonds_karp(g, s, t)
            assert got_set == {r["node"] for r in ek.source_set.collect()}


def test_push_relabel_two_paths(spark):
    from networkit_spark.operators.flow import push_relabel

    g = Graph.from_edge_list(spark, TWO_PATHS_EDGES, weighted=False, num_nodes=11)
    res = push_relabel(g, 0, 10)
    assert res.flow_value == pytest.approx(2.0)


def test_push_relabel_batched_multi_system(spark):
    """Three flow systems (different sources, shared sink) solved in ONE
    concurrent sys-keyed run match per-source Edmonds-Karp values and the
    unique min-cut source sides."""
    from networkit_spark.operators.flow import push_relabel_batched

    edges = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 1.0), (1, 3, 2.0), (2, 4, 2.0),
        (3, 4, 1.0), (3, 5, 2.0), (4, 5, 3.0), (2, 3, 1.0),
    ]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=6)
    sources = [(0, 0), (1, 1), (2, 2)]
    b = push_relabel_batched(g, sources, sink=5)
    flows = {r["sys"]: r["flow"] for r in b.flow_values.collect()}
    sets: dict = {}
    for r in b.source_sets.collect():
        sets.setdefault(r["sys"], set()).add(r["node"])
    for sys_id, src in sources:
        want_val, want_set = python_edmonds_karp(edges, 6, src, 5)
        assert flows[sys_id] == pytest.approx(want_val), src
        assert sets[sys_id] == set(want_set), src


def test_cut_clustering_batched_equals_sequential(spark):
    """Wave-batched cut clustering (batch=3 forces multiple waves and the
    absorbed-within-wave skip) is row-identical to the sequential
    reference-shaped loop — including representative ids."""
    clique_a = [(a, b, 1.0) for a in range(4) for b in range(a + 1, 4)]
    clique_b = [(a, b, 1.0) for a in range(4, 8) for b in range(a + 1, 8)]
    edges = clique_a + clique_b + [(3, 4, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=8)

    seq = {
        r["node"]: r["cluster"]
        for r in cut_clustering(g, alpha=0.6, method="sequential").collect()
    }
    bat = {
        r["node"]: r["cluster"]
        for r in cut_clustering(g, alpha=0.6, method="batched", batch=3).collect()
    }
    assert bat == seq


def _brute_force_directed_mincut(edges, n, s, t):
    """Min directed s-t cut by subset enumeration: min over S∋s, t∉S of
    Σ cap(u→v) with u∈S, v∉S."""
    from itertools import combinations

    others = [u for u in range(n) if u not in (s, t)]
    best = float("inf")
    for k in range(len(others) + 1):
        for extra in combinations(others, k):
            S = {s, *extra}
            cut = sum(w for u, v, w in edges if u in S and v not in S)
            best = min(best, cut)
    return best


def test_directed_max_flow_duality(spark):
    """Directed graphs get explicit cap-0 reverse residual arcs; without
    them flow could never be cancelled and EK returns wrong values. Both
    engines must hit the brute-force directed min-cut."""
    import random

    from networkit_spark.operators.flow import push_relabel

    rng = random.Random(11)
    n = 7
    edges = []
    for u in range(n):
        for v in range(n):
            if u != v and rng.random() < 0.35:
                edges.append((u, v, float(rng.randint(1, 5))))
    g = Graph.from_edge_list(spark, edges, weighted=True, directed=True, num_nodes=n)
    want = _brute_force_directed_mincut(edges, n, 0, n - 1)
    assert edmonds_karp(g, 0, n - 1).flow_value == pytest.approx(want)
    assert push_relabel(g, 0, n - 1).flow_value == pytest.approx(want)


def test_directed_flow_requires_cancellation(spark):
    """A directed instance where BFS's first augmenting path must later be
    partially undone through a reverse residual arc."""
    # 0→1→3 is the unique shortest path but consumes 1→3; optimum reroutes
    # through 1→2→3 after cancellation via the 2→1 back edge's residual
    edges = [
        (0, 1, 1.0), (1, 3, 1.0), (0, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0),
    ]
    g = Graph.from_edge_list(spark, edges, weighted=True, directed=True, num_nodes=4)
    want = _brute_force_directed_mincut(edges, 4, 0, 3)
    assert edmonds_karp(g, 0, 3).flow_value == pytest.approx(want)


def test_self_loop_at_source_no_phantom_flow(spark):
    """Self-loops are dropped from the residual: the init-preflow delta of a
    source self-loop would otherwise double-key the arc join and surface a
    phantom flow row (push_relabel_batched deltas0)."""
    from networkit_spark.operators.flow import push_relabel

    edges = [(0, 0, 5.0), (0, 1, 3.0), (1, 2, 2.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=3)
    ek = edmonds_karp(g, 0, 2)
    pr = push_relabel(g, 0, 2)
    assert ek.flow_value == pytest.approx(2.0)
    assert pr.flow_value == pytest.approx(2.0)
    assert pr.flows().filter("u = v").count() == 0
    assert ek.flows().filter("u = v").count() == 0


def test_push_relabel_missing_sink_zero_flow(spark):
    from networkit_spark.operators.flow import push_relabel

    g = Graph.from_edge_list(spark, [(0, 1, 2.0)], weighted=True)
    assert push_relabel(g, 0, 99).flow_value == 0.0
    assert edmonds_karp(g, 0, 99).flow_value == 0.0


def test_hierarchy_alpha_upper_floor(spark):
    """Reference floor (CutClustering.cpp:85-92): weighted all-unit-weight
    graphs search up to upper = max(2, 1) + 1 = 3. The singleton level key
    tightens DOWN to its lowest optimal alpha (the breakpoint), so the
    observable contract is: the singleton level exists and every recorded
    alpha lies within the reference range."""
    from networkit_spark.operators.flow import cut_clustering_hierarchy

    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=3)
    hier = cut_clustering_hierarchy(g)
    assert any(len(set(c.values())) == 3 for c in hier.values())
    assert all(a <= 3.0 for a in hier)
