"""Round-2 wave-5 operators: TopCloseness, KPathCentrality,
PermanenceCentrality, ParallelAgglomerativeClusterer, KatzIndex,
PrefixJaccardScore, ChibaNishizeki quadrangle score — verified against
small-fixture exact replicas computed in plain Python."""

import itertools
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from tests.conftest import CC20_EDGES, LCC16_EDGES


def _graph(spark, edges, weights=None, n=None):
    rows = [
        (a, b, 1.0 if weights is None else weights[i])
        for i, (a, b) in enumerate(edges)
    ]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(df, directed=False, weighted=weights is not None, num_nodes=n)


def _adj(edges, n):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def _bfs(adj, s):
    dist = {s: 0}
    frontier = [s]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_top_closeness_exact(spark):
    n = 20
    g = _graph(spark, CC20_EDGES)
    adj = _adj(CC20_EDGES, n)
    # exact per-component closeness (r-1)/farness for every node
    exact = {}
    for v in range(n):
        d = _bfs(adj, v)
        far = sum(d.values())
        exact[v] = (len(d) - 1) / far if far > 0 else 0.0
    want = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:5]
    from networkit_spark.operators.centrality import top_closeness

    got = [(r["node"], r["score"]) for r in top_closeness(g, k=5, batch=4).collect()]
    assert [n_ for n_, _ in got] == [n_ for n_, _ in want]
    for (gn, gs), (wn, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_kpath_centrality_shape(spark):
    g = _graph(spark, LCC16_EDGES)
    from networkit_spark.operators.centrality import kpath_centrality

    s1 = kpath_centrality(g, k=4, walks_per_node=3, seed=5)
    rows = {r["node"]: r["score"] for r in s1.collect()}
    assert len(rows) == g.num_nodes()
    assert all(v >= 0 for v in rows.values())
    assert any(v > 0 for v in rows.values())
    # deterministic under the same seed
    s2 = kpath_centrality(g, k=4, walks_per_node=3, seed=5)
    assert {r["node"]: r["score"] for r in s2.collect()} == rows
    # hub nodes of the LCC16 clique region are visited more than leaves
    assert rows[8] > rows[2]


def test_permanence_matches_reference_formula(spark):
    edges = LCC16_EDGES
    n = 16
    g = _graph(spark, edges, n=n)
    adj = _adj(edges, n)
    part = {v: (0 if v < 8 else 1) for v in range(n)}
    labels = spark.createDataFrame(
        [(v, part[v]) for v in range(n)], "node long, label long"
    )

    def perm(v):
        if not adj[v]:
            return 0.0
        strength = defaultdict(int)
        for y in adj[v]:
            strength[part[y]] += 1
        internal = strength[part[v]]
        emax = max(
            [c for comm, c in strength.items() if comm != part[v]], default=0
        ) or 1
        ins = [y for y in adj[v] if part[y] == part[v]]
        if len(ins) < 2:
            cin = 0.0
        else:
            closed = sum(
                1 for y, z in itertools.combinations(ins, 2) if z in adj[y]
            )
            cin = closed / (0.5 * len(ins) * (len(ins) - 1))
        return internal / emax / len(adj[v]) - (1.0 - cin)

    from networkit_spark.operators.community import permanence_centrality

    got = {r["node"]: r["score"] for r in permanence_centrality(g, labels).collect()}
    for v in range(n):
        assert got[v] == pytest.approx(perm(v), abs=1e-9), f"node {v}"


def test_agglomerative_clusterer(spark):
    # two 5-cliques joined by one bridge edge -> agglomeration should keep
    # the cliques in separate communities
    edges = [
        (a, b) for a, b in itertools.combinations(range(5), 2)
    ] + [
        (a + 5, b + 5) for a, b in itertools.combinations(range(5), 2)
    ] + [(4, 5)]
    g = _graph(spark, edges)
    from networkit_spark.operators.community import agglomerative_clusterer, modularity

    labels = agglomerative_clusterer(g)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert len(got) == 10
    # agglomeration terminates with a non-trivial community structure of
    # positive modularity (the matching chain may pull the bridge pair into
    # one side, exactly like the reference's matching-based coarsening)
    assert 2 <= len(set(got.values())) < 10
    assert modularity(g, labels) > 0.2


def test_katz_index_exact_path_counts(spark):
    edges = CC20_EDGES
    n = 20
    g = _graph(spark, edges)
    adj = _adj(edges, n)
    beta, L = 0.05, 4

    def katz(u, v):
        # exact walk counts via matrix powers
        import numpy as np

        A = np.zeros((n, n))
        for a, b in edges:
            A[a, b] = A[b, a] = 1.0
        s, P = 0.0, np.eye(n)
        for l in range(1, L + 1):
            P = P @ A
            s += (beta ** l) * P[u, v]
        return s

    pairs = spark.createDataFrame([(0, 4), (1, 19), (3, 9), (13, 15)], "u long, v long")
    from networkit_spark.operators.linkprediction import katz_index

    got = {(r["u"], r["v"]): r["score"] for r in katz_index(g, pairs, beta, L).collect()}
    for (u, v), s in got.items():
        assert s == pytest.approx(katz(u, v), rel=1e-9), (u, v)


def test_prefix_jaccard_score(spark):
    edges = LCC16_EDGES
    n = 16
    g = _graph(spark, edges)
    adj = _adj(edges, n)
    deg = {v: len(adj[v]) for v in range(n)}
    k = 3

    def prefix(v):
        return set(sorted(adj[v], key=lambda y: (-deg[y], y))[:k])

    from networkit_spark.operators.sparsification import prefix_jaccard_score

    got = {(r["src"], r["dst"]): r["score"] for r in prefix_jaccard_score(g, k).collect()}
    for (u, v), s in got.items():
        pu, pv = prefix(u), prefix(v)
        want = len(pu & pv) / len(pu | pv) if pu | pv else 0.0
        assert s == pytest.approx(want, abs=1e-9), (u, v)


def test_quadrangle_edge_score(spark):
    # 4-cycle + chord + pendant: cycle edges sit on one quadrangle each
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (3, 4)]
    g = _graph(spark, edges)
    from networkit_spark.operators.sparsification import quadrangle_edge_score

    got = {(r["src"], r["dst"]): r["score"] for r in quadrangle_edge_score(g).collect()}
    assert got[(0, 1)] == 1
    assert got[(1, 2)] == 1
    assert got[(2, 3)] == 1
    assert got[(3, 0)] == 1
    assert got[(0, 2)] == 0  # the chord is on no 4-cycle
    assert got[(3, 4)] == 0  # pendant edge


def test_quadrangle_vs_bruteforce(spark):
    edges = LCC16_EDGES
    n = 16
    g = _graph(spark, edges)
    adj = _adj(edges, n)
    eset = {(min(a, b), max(a, b)) for a, b in edges}

    def quads(u, v):
        c = 0
        for w in adj[v]:
            if w == u:
                continue
            for x in adj[u]:
                if x == v or x == w:
                    continue
                if x in adj[w]:
                    c += 1
        return c

    from networkit_spark.operators.sparsification import quadrangle_edge_score

    got = {(r["src"], r["dst"]): r["score"] for r in quadrangle_edge_score(g).collect()}
    for (u, v) in eset:
        assert got[(u, v)] == quads(u, v), (u, v)
