"""Dynamic generators (cpp/generators/Dynamic*Generator.cpp) feeding the
dynamics layer, and the StochasticBlockmodel static generator
(cpp/generators/StochasticBlockmodel.cpp)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.streaming.dynamic import DynBFS
from networkit_spark.streaming.dynamic_generators import (
    dynamic_barabasi_albert_events,
    dynamic_dorogovtsev_mendes_events,
    dynamic_path_events,
    dynamic_pubweb_events,
)
from networkit_spark.streaming.graph_events import apply_events


def _fold(spark, events):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    return apply_events(empty, events)


def test_dm_stream_structure(spark):
    """DorogovtsevMendes invariants (DynamicDorogovtsevMendesGenerator.cpp):
    after s steps — 3+s nodes, 3+2s edges, every node has degree >= 2 (a new
    node arrives with exactly 2 edges and can only gain more later)."""
    steps = 12
    ev = dynamic_dorogovtsev_mendes_events(spark, steps, seed=7)
    edges = _fold(spark, ev)
    g = Graph(edges, directed=False, weighted=True)
    assert g.num_nodes() == 3 + steps
    assert g.num_edges() == 3 + 2 * steps
    deg = {r["node"]: r["degree"] for r in g.degrees().collect()}
    assert all(d >= 2 for d in deg.values())
    # the LAST node just arrived: exactly its two attachment edges
    assert deg[2 + steps] == 2


def test_dm_stream_deterministic(spark):
    a = dynamic_dorogovtsev_mendes_events(spark, 6, seed=3).collect()
    b = dynamic_dorogovtsev_mendes_events(spark, 6, seed=3).collect()
    assert a == b


def test_ba_stream_structure(spark):
    """DynamicBarabasiAlbert: k-path seed, each step adds k edges from the
    new node to k distinct earlier nodes."""
    k, steps = 3, 10
    ev = dynamic_barabasi_albert_events(spark, k=k, steps=steps, seed=5)
    g = Graph(_fold(spark, ev), directed=False, weighted=True)
    assert g.num_nodes() == k + steps
    assert g.num_edges() == (k - 1) + k * steps
    # preferential attachment: seed path nodes accumulate higher degree than
    # the last arrivals on average
    deg = {r["node"]: r["degree"] for r in g.degrees().collect()}
    early = sum(deg[u] for u in range(k)) / k
    late = sum(deg[u] for u in range(k + steps - 3, k + steps)) / 3
    assert early > late


def test_dynbfs_over_dm_stream_equals_recompute(spark):
    """Round-2 verdict item #8 'done' criterion: DynBFS maintained over a
    DynamicDorogovtsevMendes event stream equals a from-scratch BFS after
    every batch."""
    from networkit_spark.operators.distance import bfs_distances

    ev = dynamic_dorogovtsev_mendes_events(spark, 9, seed=11).collect()
    # split the stream into batches at TIME_STEP boundaries
    batches, cur = [], []
    for r in ev:
        cur.append(tuple(r))
        if r["type"] == "TIME_STEP":
            batches.append(cur)
            cur = []
    if cur:
        batches.append(cur)
    schema = "seq long, type string, u long, v long, w double, ts timestamp"
    # initial graph = fold of batch 0 (seed triangle)
    edges = apply_events(
        spark.createDataFrame([], "src long, dst long, weight double"),
        spark.createDataFrame(batches[0], schema),
    ).localCheckpoint(eager=True)
    g = Graph(edges, directed=False, weighted=True)
    dyn = DynBFS(g, source=0)
    for batch in batches[1:4] + [sum(batches[4:], [])]:  # 3 single + 1 merged
        bdf = spark.createDataFrame(batch, schema)
        dyn.update(bdf)
        got = {r["node"]: r["dist"] for r in dyn.distances.collect()}
        want = {
            r["node"]: float(r["dist"])
            for r in bfs_distances(dyn.graph, 0).collect()
        }
        assert got == want


def test_path_and_pubweb_streams(spark):
    g = Graph(_fold(spark, dynamic_path_events(spark, 5)), weighted=True)
    assert g.num_edges() == 5
    ev = dynamic_pubweb_events(spark, n=14, steps=3, seed=9)
    types = {r["type"] for r in ev.select("type").distinct().collect()}
    assert "EDGE_ADDITION" in types and "TIME_STEP" in types
    # folding the whole stream yields a valid simple undirected graph
    g2 = Graph(_fold(spark, ev), weighted=True)
    assert g2.edges.filter(F.col("src") >= F.col("dst")).count() == 0


def test_forest_fire_stream(spark):
    """DynamicForestFireGenerator.cpp:23-138 analog: every new node links to
    its ambassador (burned first) plus a geometric spread; the fold is a
    valid growing graph, deterministic per seed, and one EDGE_ADDITION's
    endpoint set per step always contains the new node."""
    from networkit_spark.streaming.dynamic_generators import (
        dynamic_forest_fire_events,
    )

    ev1 = dynamic_forest_fire_events(spark, steps=12, p=0.5, seed=11)
    ev2 = dynamic_forest_fire_events(spark, steps=12, p=0.5, seed=11)
    assert ev1.collect() == ev2.collect()

    rows = ev1.orderBy("seq").collect()
    # step 0 emits exactly the seed node
    assert rows[0]["type"] == "NODE_ADDITION" and rows[1]["type"] == "TIME_STEP"
    # each later step: one NODE_ADDITION v, then >=1 EDGE_ADDITION all from v
    adds = [r for r in rows if r["type"] == "EDGE_ADDITION"]
    assert adds, "no edges burned"
    by_node: dict = {}
    for r in adds:
        by_node.setdefault(r["u"], []).append(r["v"])
    for v, targets in by_node.items():
        assert all(t < v for t in targets)  # burns only existing nodes
        assert len(set(targets)) == len(targets)  # distinct burned set
    g = Graph(_fold(spark, ev1), weighted=True)
    assert g.num_edges() == len(adds)
    # higher p burns (weakly) more per step on the same seed
    hot = dynamic_forest_fire_events(spark, steps=12, p=0.9, seed=11)
    assert hot.filter(F.col("type") == "EDGE_ADDITION").count() >= len(adds)


def test_hyperbolic_stream_diff_validity(spark):
    """DynamicHyperbolicGenerator analog: deterministic per seed; replaying
    the stream adds only absent and removes only present edges; movement
    actually produces both event kinds; with move_each_step=0 the stream is
    static after the initial block."""
    from networkit_spark.streaming.dynamic_generators import (
        dynamic_hyperbolic_events,
    )

    ev = dynamic_hyperbolic_events(spark, n=24, steps=6, move_each_step=0.5, seed=5)
    assert (
        ev.collect()
        == dynamic_hyperbolic_events(
            spark, n=24, steps=6, move_each_step=0.5, seed=5
        ).collect()
    )
    live: set = set()
    kinds: set = set()
    for r in ev.orderBy("seq").collect():
        if r["type"] == "EDGE_ADDITION":
            e = (r["u"], r["v"])
            assert e not in live, e
            live.add(e)
            kinds.add("add")
        elif r["type"] == "EDGE_REMOVAL":
            e = (r["u"], r["v"])
            assert e in live, e
            live.remove(e)
            kinds.add("rm")
    assert kinds == {"add", "rm"}, "movement must churn the threshold graph"
    assert live, "final graph should be non-empty"

    frozen = dynamic_hyperbolic_events(spark, n=24, steps=3, move_each_step=0.0, seed=5)
    after_first = frozen.filter(
        (F.col("type") != "TIME_STEP") & (F.col("ts") > F.lit("2020-01-01 00:00:00"))
    )
    assert after_first.count() == 0


def test_stochastic_blockmodel(spark):
    from networkit_spark.generators import stochastic_blockmodel

    n = 60
    membership = [i % 3 for i in range(n)]
    aff = [
        [0.9, 0.05, 0.05],
        [0.05, 0.9, 0.05],
        [0.05, 0.05, 0.9],
    ]
    g = stochastic_blockmodel(spark, membership, aff, seed=4)
    e = g.edges.select("src", "dst").collect()
    same = sum(1 for r in e if r["src"] % 3 == r["dst"] % 3)
    cross = len(e) - same
    # 3 blocks x C(20,2) = 570 intra pairs at 0.9, 1200 inter pairs at 0.05
    assert same > 400 and cross < 150
    # deterministic in the seed
    g2 = stochastic_blockmodel(spark, membership, aff, seed=4)
    assert sorted(map(tuple, e)) == sorted(
        map(tuple, g2.edges.select("src", "dst").collect())
    )
    # degenerate affinities are exact
    full = stochastic_blockmodel(spark, [0] * 8, [[1.0]], seed=1)
    assert full.num_edges() == 8 * 7 // 2


def test_stochastic_blockmodel_rejects_bad_affinity(spark):
    from networkit_spark.generators import stochastic_blockmodel

    with pytest.raises(ValueError):
        stochastic_blockmodel(spark, [0, 1], [[0.5, 0.5]], seed=1)
