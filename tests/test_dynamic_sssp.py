"""DynBFS / DynDijkstra: incremental distances under event batches must
equal a from-scratch recompute after every batch (the reference's own
DynBFS/DynDijkstra invariant — cpp/graph/test/GraphGTest has the analog)."""

import random

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.distance import bfs_distances, sssp_distances
from networkit_spark.streaming.dynamic import DynBFS, DynDijkstra
from networkit_spark.streaming.graph_events import EVENT_SCHEMA


def _graph(spark, edges, weighted=False):
    rows = [(a, b, float(w)) for a, b, w in edges]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(df, directed=False, weighted=weighted)


def _events(spark, evs, seq0=0):
    rows = [
        (seq0 + i, t, int(u), int(v), float(w), None)
        for i, (t, u, v, w) in enumerate(evs)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _dist_map(df):
    return {r["node"]: r["dist"] for r in df.collect()}


# canonical edges use (min, max) endpoint order to match apply_events' fold
BASE = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0),
        (0, 6, 1.0), (6, 7, 1.0), (2, 7, 1.0), (5, 8, 1.0)]


def test_dynbfs_addition_shortcut(spark):
    d = DynBFS(_graph(spark, BASE), source=0)
    assert _dist_map(d.distances)[5] == 5.0
    # add shortcut 0-5: dist[5] drops to 1, dist[8] to 2
    d.update(_events(spark, [("EDGE_ADDITION", 0, 5, 1.0)]))
    got = _dist_map(d.distances)
    fresh = _dist_map(bfs_distances(d.graph, 0))
    assert {k: float(v) for k, v in fresh.items()} == got
    assert got[5] == 1.0 and got[8] == 2.0


def test_dynbfs_removal_reroute_and_disconnect(spark):
    d = DynBFS(_graph(spark, BASE), source=0)
    # remove 0-1: 1,2,3,... must reroute through 6-7-2
    d.update(_events(spark, [("EDGE_REMOVAL", 0, 1, 1.0)]))
    got = _dist_map(d.distances)
    fresh = _dist_map(bfs_distances(d.graph, 0))
    assert {k: float(v) for k, v in fresh.items()} == got
    assert got[2] == 3.0 and got[1] == 4.0
    # now cut the bridge 5-8: node 8 becomes unreachable entirely
    d.update(_events(spark, [("EDGE_REMOVAL", 4, 5, 1.0),
                             ("EDGE_REMOVAL", 5, 8, 1.0)], seq0=10))
    got = _dist_map(d.distances)
    fresh = _dist_map(bfs_distances(d.graph, 0))
    assert {k: float(v) for k, v in fresh.items()} == got
    assert 8 not in got and 5 not in got


def test_dyndijkstra_weight_update(spark):
    w_edges = [(0, 1, 4.0), (0, 2, 1.0), (1, 2, 2.0), (1, 3, 1.0),
               (2, 3, 5.0), (3, 4, 1.0)]
    d = DynDijkstra(_graph(spark, w_edges, weighted=True), source=0)
    assert _dist_map(d.distances) == {0: 0.0, 2: 1.0, 1: 3.0, 3: 4.0, 4: 5.0}
    # cheapen 2-3 to 0.5 (weight update = remove+add in the SP sense)
    d.update(_events(spark, [("EDGE_WEIGHT_UPDATE", 2, 3, 0.5)]))
    got = _dist_map(d.distances)
    fresh = _dist_map(sssp_distances(d.graph, 0))
    assert fresh == got
    assert got[3] == 1.5 and got[4] == 2.5
    # now raise it back up to 10: path must reroute via node 1
    d.update(_events(spark, [("EDGE_WEIGHT_UPDATE", 2, 3, 10.0)], seq0=5))
    got = _dist_map(d.distances)
    fresh = _dist_map(sssp_distances(d.graph, 0))
    assert fresh == got
    assert got[3] == 4.0


def test_dynbfs_random_batches_match_recompute(spark):
    rng = random.Random(7)
    n = 30
    edges = {(i, i + 1) for i in range(n - 1)}
    edges |= {tuple(sorted(rng.sample(range(n), 2))) for _ in range(40)}
    d = DynBFS(_graph(spark, [(a, b, 1.0) for a, b in sorted(edges)]), source=0)
    seq = 0
    for _ in range(3):
        evs = []
        for _ in range(6):
            if edges and rng.random() < 0.5:
                a, b = rng.choice(sorted(edges))
                edges.discard((a, b))
                evs.append(("EDGE_REMOVAL", a, b, 1.0))
            else:
                a, b = sorted(rng.sample(range(n), 2))
                edges.add((a, b))
                evs.append(("EDGE_ADDITION", a, b, 1.0))
        d.update(_events(spark, evs, seq0=seq))
        seq += len(evs)
        got = _dist_map(d.distances)
        fresh = _dist_map(bfs_distances(d.graph, 0))
        assert {k: float(v) for k, v in fresh.items()} == got


def test_bounded_exploration_incomplete_dijkstra(spark):
    """IncompleteDijkstra parity: max_dist prunes the ball exactly —
    distances within the bound match the unbounded run, nothing beyond the
    bound is returned."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.distance import (
        bfs_distances,
        graph_distance,
        sssp_distances,
    )

    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 4, 5.0), (0, 5, 10.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    full = {r.node: r.dist for r in sssp_distances(g, 0).collect()}
    bounded = {r.node: r.dist for r in sssp_distances(g, 0, max_dist=4.0).collect()}
    assert bounded == {n: d for n, d in full.items() if d <= 4.0}
    assert 4 not in bounded and 5 not in bounded
    hop = {r.node: r.dist for r in bfs_distances(g, 0, max_dist=2).collect()}
    assert set(hop) == {0, 1, 2, 5}
    assert graph_distance(g, 0, 4) == full[4]
    g2 = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    assert graph_distance(g2, 0, 1) == 1.0
    assert graph_distance(g2, 0, 3) == float("inf")
