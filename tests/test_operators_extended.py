import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.centrality import (
    centralization,
    closeness_sampled,
    degree_assortativity,
    degree_centrality,
    ranking,
    sfigality,
    betweenness_sampled,
)
from networkit_spark.operators.distance import (
    bfs_distances,
    eccentricity,
    effective_diameter_approx,
    neighborhood_function_anf,
    sssp_distances,
)
from networkit_spark.operators.kcore import coreness, k_core
from networkit_spark.operators.linkprediction import (
    link_prediction_scores,
    missing_links,
    top_predictions,
)
from networkit_spark.operators.pagerank import eigenvector_centrality, katz_centrality
from networkit_spark.operators.sparsification import (
    global_threshold_filter,
    jaccard_similarity_score,
    local_degree_score,
    random_edge_score,
    sparsify_to_ratio,
)

# path 0-1-2-3-4 plus triangle 5-6-7 attached at 4-5
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (5, 7), (6, 7)]


@pytest.fixture(scope="module")
def g(spark):
    return Graph.from_edge_list(spark, EDGES, num_nodes=8)


def test_bfs_distances(spark, g):
    d = {r["node"]: r["dist"] for r in bfs_distances(g, 0).collect()}
    assert d == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 6}
    assert eccentricity(g, 0) == 6


def test_sssp_weighted(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 1.0)]
    gw = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=4)
    d = {r["node"]: r["dist"] for r in sssp_distances(gw, 0).collect()}
    assert d == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}  # 0-1-2 beats direct 0-2


def test_kcore(spark, g):
    core2 = sorted(r["node"] for r in k_core(g, 2).collect())
    assert core2 == [5, 6, 7]  # only the triangle survives 2-core peeling
    cores = {r["node"]: r["core"] for r in coreness(g).collect()}
    assert cores[5] == cores[6] == cores[7] == 2
    assert cores[0] == 1 and cores[4] == 1


def test_degree_centrality_and_ranking(spark, g):
    dc = degree_centrality(g)
    r = ranking(dc).collect()
    assert r[0]["node"] == 5 and r[0]["rank"] == 1  # deg(5)=3 max
    c = centralization(dc)
    assert 0 < c < 1


def test_sfigality(spark, g):
    s = {r["node"]: r["score"] for r in sfigality(g).collect()}
    assert s[0] == 1.0  # its only neighbor (1) has higher degree
    assert s[5] == 0.0  # neighbors 4,6,7 all have degree <= 3


def test_closeness_sampled_exact_on_full_sample(spark, g):
    s = {r["node"]: r["score"] for r in closeness_sampled(g, list(range(8))).collect()}
    # node 0 distances: 0+1+2+3+4+5+6+6=27 over 8 reached → 8/27
    assert s[0] == pytest.approx(8 / 27)


def test_betweenness_sampled_path(spark):
    path = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], num_nodes=5)
    b = {r["node"]: r["score"] for r in
         betweenness_sampled(path, list(range(5))).collect()}
    # exact Brandes (all sources, both directions counted once per source):
    # middle node 2 lies on 0-3,0-4,1-3,1-4,3-0.. → score 2*(2*3-2)/... check symmetry
    assert b[2] > b[1] > b[0]
    assert b[0] == 0.0 and b[4] == 0.0
    # path betweenness is symmetric
    assert b[1] == pytest.approx(b[3])
    assert b[2] == pytest.approx(8.0)  # pairs through 2: (0,3),(0,4),(1,3),(1,4) ×2 dirs


def test_katz_and_eigenvector_order(spark, g):
    kz = {r["node"]: r["score"] for r in katz_centrality(g, alpha=0.05).collect()}
    assert kz[5] == max(kz.values())  # hub has top Katz
    ev = {r["node"]: r["score"] for r in eigenvector_centrality(g, tol=1e-8).collect()}
    assert max(ev, key=ev.get) in (5, 6, 7)  # mass concentrates on the triangle


def test_degree_assortativity_star(spark):
    star = Graph.from_edge_list(spark, [(0, i) for i in range(1, 6)], num_nodes=6)
    assert degree_assortativity(star) == pytest.approx(-1.0)


def test_link_prediction(spark, g):
    pairs = spark.createDataFrame([(6, 7), (0, 2), (0, 7)], "u long, v long")
    s = {(r["u"], r["v"]): r for r in link_prediction_scores(g, pairs).collect()}
    assert s[(6, 7)]["common_neighbors"] == 1  # node 5
    assert s[(0, 2)]["common_neighbors"] == 1  # node 1
    assert s[(0, 7)]["common_neighbors"] == 0
    assert s[(0, 2)]["jaccard"] == pytest.approx(1 / 2)  # |{1}| / |{1} ∪ {1,3}|
    assert s[(6, 7)]["adamic_adar"] == pytest.approx(1 / math.log(3))
    assert s[(6, 7)]["preferential_attachment"] == 4
    ml = {(r["u"], r["v"]) for r in missing_links(g).collect()}
    assert (0, 2) in ml and (6, 7) not in ml  # 6-7 already an edge
    top = top_predictions(link_prediction_scores(g, pairs), "common_neighbors", 1).collect()
    assert (top[0]["u"], top[0]["v"]) == (0, 2)  # tie on cn=1 → smallest (u,v)


def test_sparsification(spark, g):
    js = jaccard_similarity_score(g)
    got = {(r["src"], r["dst"]): r["score"] for r in js.collect()}
    assert got[(6, 7)] == pytest.approx(1.0 / 1.0)  # tri=1, denom=2+2-1-2=1
    assert got[(0, 1)] == 0.0
    filtered = global_threshold_filter(g, js, 0.5)
    kept = {(r["src"], r["dst"]) for r in filtered.edges.collect()}
    assert kept == {(5, 6), (5, 7), (6, 7)}
    lds = local_degree_score(g)
    assert lds.count() == len(EDGES)
    res = random_edge_score(g, seed=1)
    assert res.agg(F.min("score"), F.max("score")).collect()[0][1] <= 1.0
    sp = sparsify_to_ratio(g, js, 0.4)
    assert 0 < sp.num_edges() <= len(EDGES)


def test_anf_neighborhood_function(spark):
    """ANF estimate on a clique: every node reaches all n at hop 1 and the
    curve is flat afterwards."""
    n = 30
    clique = [(i, j) for i in range(n) for j in range(i + 1, n)]
    g = Graph.from_edge_list(spark, clique, num_nodes=n)
    nf = neighborhood_function_anf(g, num_sketches=16, max_hops=4)
    assert len(nf) <= 3  # converges immediately after hop 1
    est = nf[0][1]
    assert n * n * 0.4 < est < n * n * 2.5  # FM sketch within ~2x of n²
    ed = effective_diameter_approx(g, num_sketches=16, max_hops=4)
    assert ed <= 1.5


def test_harmonic_closeness_path_graph(spark):
    """Harmonic closeness on a 4-path from all sources equals the hand sum;
    an isolated far node scores 0 without degenerating the others."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.centrality import harmonic_closeness_sampled

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (8, 9)])
    got = {
        r.node: r.score
        for r in harmonic_closeness_sampled(g, [0, 1, 2, 3]).collect()
    }
    # node 1: d(0)=1, d(2)=1, d(3)=2 -> 2.5 ; node 0: 1 + 1/2 + 1/3
    assert got[1] == pytest.approx(2.5)
    assert got[0] == pytest.approx(1 + 0.5 + 1 / 3)
    assert got[8] == 0.0 and got[9] == 0.0


def _edge_bw_replica(edges, sources):
    """Driver-side Brandes edge betweenness over BFS DAGs (the spec)."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    eb = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -2) == dist[w] - 1:
                    c = sigma[v] / sigma[w] * (1.0 + delta[w])
                    eb[tuple(sorted((v, w)))] += c
                    delta[v] += c
    return dict(eb)


def test_edge_betweenness_matches_replica(spark):
    import itertools, random
    from networkit_spark.graph import Graph
    from networkit_spark.operators.centrality import edge_betweenness_sampled

    rng = random.Random(3)
    edges = [
        (u, v) for u, v in itertools.combinations(range(14), 2)
        if rng.random() < 0.3
    ]
    g = Graph.from_edge_list(spark, edges)
    srcs = sorted({u for e in edges for u in e})[:6]
    got = {(r.src, r.dst): r.score for r in edge_betweenness_sampled(g, srcs).collect()}
    want = _edge_bw_replica(edges, srcs)
    assert set(got) == {tuple(sorted(e)) for e in edges}
    for e, sc in got.items():
        assert sc == pytest.approx(want.get(e, 0.0), abs=1e-9), e


def test_edge_betweenness_path(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.centrality import edge_betweenness_sampled

    # path 0-1-2-3, all sources: middle edge carries the most pairs
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)])
    got = {(r.src, r.dst): r.score for r in edge_betweenness_sampled(g, [0, 1, 2, 3]).collect()}
    # per source, edge dependency = #pairs crossing; summed over 4 sources:
    # (0,1): from 0 covers 3, from 1.. covers 1+1+1 -> 6; (1,2): 2+2+2+2=8
    assert got[(0, 1)] == pytest.approx(6.0)
    assert got[(1, 2)] == pytest.approx(8.0)
    assert got[(2, 3)] == pytest.approx(6.0)
