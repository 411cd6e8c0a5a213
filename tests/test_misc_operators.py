import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.misc import (
    algebraic_distance,
    diameter_range,
    luby_independent_set,
    pagerank_nibble,
    personalized_pagerank,
    spanning_forest,
)


def test_diameter_range_path(spark):
    g = Graph.from_edge_list(spark, [(i, i + 1) for i in range(6)], num_nodes=7)
    lo, hi = diameter_range(g, start=3)
    assert lo == 6 and hi == 12  # exact diameter 6 found by 2-sweep from center


def test_luby_mis_path(spark):
    g = Graph.from_edge_list(spark, [(i, i + 1) for i in range(9)], num_nodes=10)
    mis = sorted(r["node"] for r in luby_independent_set(g).collect())
    s = set(mis)
    # independent: no two adjacent
    assert all((i, i + 1) not in [(a, b) for a in s for b in s if b == a + 1] for i in range(9))
    for i in range(9):
        assert not (i in s and i + 1 in s)
    # maximal: every non-member has a member neighbor
    for v in range(10):
        if v not in s:
            assert (v - 1 in s) or (v + 1 in s)


def test_spanning_forest_mst(spark):
    # square with diagonal: MST must pick the 3 cheapest connecting edges
    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (0, 3, 5.0), (0, 2, 4.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=4)
    forest = spanning_forest(g).collect()
    got = sorted((r["src"], r["dst"], r["weight"]) for r in forest)
    assert got == [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)]
    total = sum(w for _, _, w in got)
    assert total == 4.0


def test_spanning_forest_disconnected(spark):
    edges = [(0, 1, 1.0), (2, 3, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=4)
    assert spanning_forest(g).count() == 2  # one tree per component


def test_personalized_pagerank_localizes(spark):
    # two triangles bridged: PPR from node 0 concentrates on its triangle
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, num_nodes=6)
    ppr = {r["node"]: r["score"] for r in personalized_pagerank(g, [0]).collect()}
    assert ppr[0] > ppr[3] and ppr[1] > ppr[4]
    assert sum(ppr.values()) == pytest.approx(1.0, abs=0.2)  # dangling-free graph


def test_pagerank_nibble_finds_seed_community(spark):
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, num_nodes=6)
    comm = sorted(r["node"] for r in pagerank_nibble(g, seed=0).collect())
    assert comm == [0, 1, 2]  # the seed's triangle is the min-conductance cut


def test_algebraic_distance_separates_clusters(spark):
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, num_nodes=6)
    ad = {(r["src"], r["dst"]): r["score"] for r in algebraic_distance(g).collect()}
    bridge = ad[(2, 3)]
    intra = [v for k, v in ad.items() if k != (2, 3)]
    assert bridge > max(intra) * 0.8  # bridge is among the largest distances


def test_diameter_exact_fixtures(spark):
    """SumSweep exact diameter (Diameter.cpp exact mode) vs hand-computed
    diameters: path, cycle, star, two components, and a random graph vs a
    brute-force BFS replica."""
    from networkit_spark.operators.misc import diameter_exact

    path = Graph.from_edge_list(spark, [(i, i + 1) for i in range(6)])
    assert diameter_exact(path) == 6
    cycle = Graph.from_edge_list(spark, [(i, (i + 1) % 8) for i in range(8)])
    assert diameter_exact(cycle) == 4
    star = Graph.from_edge_list(spark, [(0, i) for i in range(1, 7)])
    assert diameter_exact(star) == 2
    # two components: diameter = max over components
    two = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (10, 11), (11, 12), (12, 13), (13, 14)]
    )
    assert diameter_exact(two) == 4


def test_diameter_exact_random_vs_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(7)
    n = 24
    edges = sorted({(min(u, v), max(u, v))
                    for u, v in (
                        (rng.randrange(n), rng.randrange(n)) for _ in range(40))
                    if u != v})
    g = Graph.from_edge_list(spark, edges)
    # brute-force BFS diameter over the edge list
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    best = 0
    for s in adj:
        dist = {s: 0}
        q = [s]
        while q:
            u = q.pop(0)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        best = max(best, max(dist.values()))
    assert diameter_exact_import()(g) == best


def diameter_exact_import():
    from networkit_spark.operators.misc import diameter_exact

    return diameter_exact


# --- diameter estimatedSamples / estimatedPedantic modes (Diameter.h:17) ----

def _ref_vd_from(dists):
    """Reference estimateFrom (Diameter.cpp:239-256): top-2 distance values
    (duplicates count) summed, +1."""
    top = sorted(dists, reverse=True)
    d1 = top[0] if top else 0
    d2 = top[1] if len(top) > 1 else 0
    return d1 + d2 + 1


def test_estimated_vertex_diameter_path(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.misc import estimated_vertex_diameter

    # path 0-1-2-3-4: from ANY start, maxD+maxD2+1 >= 5 only from ends;
    # with all nodes sampled the estimate is max over starts
    edges = [(i, i + 1, 1.0) for i in range(4)]
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False, weighted=False,
    )
    # replicate: BFS from every node
    import collections
    adj = collections.defaultdict(list)
    for u, v, _ in edges:
        adj[u].append(v); adj[v].append(u)
    def bfs(s):
        seen = {s: 0}; q = [s]
        while q:
            nq = []
            for x in q:
                for y in adj[x]:
                    if y not in seen:
                        seen[y] = seen[x] + 1; nq.append(y)
            q = nq
        return list(seen.values())
    want = max(_ref_vd_from(bfs(s)) for s in range(5))
    got = estimated_vertex_diameter(g, samples=5)
    assert got == want == 8  # ends: 4+3+1


def test_estimated_vertex_diameter_subset_is_lower_bound(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.misc import estimated_vertex_diameter

    edges = [(i, (i + 1) % 12, 1.0) for i in range(12)]
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False, weighted=False,
    )
    all_s = estimated_vertex_diameter(g, samples=12)
    few = estimated_vertex_diameter(g, samples=3)
    # even cycle: from every start the antipode is unique -> maxD=6 (once),
    # maxD2=5 -> 6+5+1, identical for every start
    assert all_s == 12 and few == 12


def test_estimated_vertex_diameter_pedantic_components(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.misc import estimated_vertex_diameter_pedantic

    # two components: a 4-path (vd from node 0: maxD=3, maxD2=2 -> 5) and an
    # edge (from node 10: maxD=1, maxD2=0 -> 1); reference takes max + 1
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (10, 11, 1.0)]
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False, weighted=False,
    )
    assert estimated_vertex_diameter_pedantic(g) == 3 + 2 + 1


def test_estimated_vertex_diameter_pedantic_weighted(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.misc import estimated_vertex_diameter_pedantic

    edges = [(0, 1, 2.0), (1, 2, 2.0), (5, 6, 1.0)]
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False, weighted=True,
    )
    # weighted mode: size of the largest component (Diameter.cpp:301-316)
    assert estimated_vertex_diameter_pedantic(g) == 3


def test_spanning_forest_long_merge_chain(spark):
    """Equal-weight path: every Borůvka round's merge graph is one long
    chain, which only converges within the inner cap because of pointer
    jumping (min-label propagation alone advances one hop per round)."""
    from networkit_spark.operators.misc import spanning_forest

    n = 300
    edges = [(i, i + 1, 1.0) for i in range(n - 1)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=n)
    forest = spanning_forest(g).collect()
    assert len(forest) == n - 1
    assert {(r["src"], r["dst"]) for r in forest} == {(i, i + 1) for i in range(n - 1)}
