"""HashingOverlapper (ref cpp/overlap/HashingOverlapper.cpp:14-94) and
ModularityScoring (ref cpp/scoring/ModularityScoring.h:90-99) against
pure-Python replicas."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.community import (
    hashing_overlapper,
    partition_intersection,
)
from networkit_spark.operators.sparsification import modularity_edge_score

EDGES = [
    (0, 1, 2.0), (0, 2, 1.0), (1, 2, 3.0),
    (2, 3, 1.0), (3, 4, 1.0), (4, 5, 2.0), (3, 5, 1.0), (5, 6, 1.0),
]


@pytest.fixture(scope="module")
def g(spark):
    return Graph.from_edge_list(spark, EDGES, weighted=True)


def test_modularity_edge_score_replica(spark, g):
    W = sum(w for _, _, w in EDGES)
    wdeg = {}
    for u, v, w in EDGES:
        wdeg[u] = wdeg.get(u, 0.0) + w
        wdeg[v] = wdeg.get(v, 0.0) + w
    got = {(r.src, r.dst): r.score for r in modularity_edge_score(g).collect()}
    assert len(got) == len(EDGES)
    for u, v, w in EDGES:
        want = w / W - (wdeg[u] / (2 * W)) * (wdeg[v] / (2 * W))
        assert got[(min(u, v), max(u, v))] == pytest.approx(want)


def test_graph_structural_rand_replica(spark, g):
    from networkit_spark.operators.measures import graph_structural_rand_measure

    a = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 1}
    b = {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 2, 6: 2}
    same = sum(
        1 for u, v, _ in EDGES if (a[u] == a[v]) == (b[u] == b[v])
    )
    want = 1.0 - same / len(EDGES)
    got = graph_structural_rand_measure(g, _labels(spark, a), _labels(spark, b))
    assert got == pytest.approx(want)
    # identical clusterings → distance 0
    assert graph_structural_rand_measure(
        g, _labels(spark, a), _labels(spark, a)
    ) == pytest.approx(0.0)


def _labels(spark, mapping):
    return spark.createDataFrame(list(mapping.items()), "node long, label long")


def test_hashing_overlapper_two_way_equals_intersection(spark):
    a = _labels(spark, {0: 10, 1: 10, 2: 20, 3: 20, 4: 30, 5: 30, 6: 30})
    b = _labels(spark, {0: 1, 1: 2, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4})
    core = {r.node: r.label for r in hashing_overlapper([a, b]).collect()}
    inter = {r.node: r.label for r in partition_intersection(a, b).collect()}
    # same equivalence classes (both min-node canonical → identical labels)
    assert core == inter
    # cells: {0},{1},{2,3},{4,5},{6}
    assert core[2] == core[3] and core[4] == core[5]
    assert len(set(core.values())) == 5


def test_hashing_overlapper_three_way(spark):
    a = _labels(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    b = _labels(spark, {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 1})
    c = _labels(spark, {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 0})
    core = {r.node: r.label for r in hashing_overlapper([a, b, c]).collect()}
    # expected cells: {0},{1},{2},{3,4},{5}
    assert core[3] == core[4] == 3
    assert len({core[0], core[1], core[2], core[3], core[5]}) == 5
    # single clustering passes through unchanged up to canonical relabel
    one = {r.node: r.label for r in hashing_overlapper([a]).collect()}
    assert one == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    with pytest.raises(ValueError):
        hashing_overlapper([])


def test_approx_centrality_wrappers(spark, g):
    from pyspark.sql import functions as F
    from networkit_spark.operators.centrality import (
        approx_betweenness,
        approx_closeness,
        betweenness_sampled,
        closeness_sampled,
    )

    srcs = [
        r["node"]
        for r in g.nodes()
        .orderBy(F.abs(F.xxhash64("node", F.lit(7))), F.asc("node"))
        .limit(3)
        .collect()
    ]
    ab = {r.node: r.score for r in approx_betweenness(g, num_samples=3, seed=7).collect()}
    manual = {
        r.node: r.score / 3.0 for r in betweenness_sampled(g, srcs).collect()
    }
    assert ab == pytest.approx(manual)
    ac = {r.node: r.score for r in approx_closeness(g, num_samples=3, seed=7).collect()}
    mc = {r.node: r.score for r in closeness_sampled(g, srcs).collect()}
    assert ac == pytest.approx(mc)


def test_partition_imbalance(spark):
    from networkit_spark.operators.measures import partition_imbalance

    lab = _labels(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2})
    # n=6, k=3 -> desired ceil(6/3)=2; max subset 3 -> 1.5
    assert partition_imbalance(lab) == pytest.approx(1.5)
    balanced = _labels(spark, {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2})
    assert partition_imbalance(balanced) == pytest.approx(1.0)


def test_bfs_sample(spark, g):
    from networkit_spark.operators.distance import bfs_sample

    sub = bfs_sample(g, source=0, k=3)
    nodes = {r.node for r in sub.nodes().collect()}
    # source + k=3 discovered (reference counts only discovered nodes
    # against k, sampling.py:5-26): dist0={0}, dist1={1,2}, dist2={3}
    assert nodes == {0, 1, 2, 3}
    edges = {(r.src, r.dst) for r in sub.edges.collect()}
    assert edges == {(0, 1), (0, 2), (1, 2), (2, 3)}
