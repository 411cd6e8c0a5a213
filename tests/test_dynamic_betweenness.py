"""DynApproxBetweenness: incremental sampled betweenness under event batches
must equal a from-scratch betweenness_sampled on the updated graph (the
reference's DynApproxBetweenness invariant, cpp/centrality/test/
CentralityGTest dyn analogs), while only affected samples recompute."""

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.centrality import betweenness_sampled
from networkit_spark.streaming.dynamic import DynApproxBetweenness
from networkit_spark.streaming.graph_events import EVENT_SCHEMA


def _graph(spark, edges):
    rows = [(a, b, float(w)) for a, b, w in edges]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(df, directed=False, weighted=False)


def _events(spark, evs, seq0=0):
    rows = [
        (seq0 + i, t, int(u), int(v), float(w), None)
        for i, (t, u, v, w) in enumerate(evs)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _scores(df):
    return {r["node"]: r["score"] for r in df.collect()}


def _assert_close(a, b):
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, (k, a[k], b[k])


# two stars joined by a path plus an isolated triangle component
EDGES = [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0),
         (5, 6, 1.0), (5, 7, 1.0),
         (8, 9, 1.0), (9, 10, 1.0), (8, 10, 1.0)]
SOURCES = [0, 2, 5, 8, 9]


def test_dyn_betweenness_matches_fresh_after_updates(spark):
    g = _graph(spark, EDGES)
    dyn = DynApproxBetweenness(g, SOURCES)
    _assert_close(_scores(dyn.scores()), _scores(betweenness_sampled(g, SOURCES)))

    # batch 1: shortcut 0-5 (reroutes the star-to-star path)
    dyn.update(_events(spark, [("EDGE_ADDITION", 0, 5, 1.0)]))
    _assert_close(_scores(dyn.scores()), _scores(betweenness_sampled(dyn.graph, SOURCES)))
    # the triangle component's samples (8, 9) were untouched
    assert 8 not in dyn.last_affected and 9 not in dyn.last_affected
    assert 0 in dyn.last_affected and 5 in dyn.last_affected

    # batch 2: removal inside the path (4-5 tight edge) + triangle edge
    dyn.update(
        _events(spark, [("EDGE_REMOVAL", 4, 5, 1.0),
                        ("EDGE_REMOVAL", 8, 10, 1.0)], seq0=10)
    )
    _assert_close(_scores(dyn.scores()), _scores(betweenness_sampled(dyn.graph, SOURCES)))
    assert 8 in dyn.last_affected  # 8-10 was tight for source 8

    # batch 3: re-adding an existing edge is an empty structural diff —
    # no sample may recompute
    dyn.update(_events(spark, [("EDGE_ADDITION", 0, 1, 1.0)], seq0=20))
    assert dyn.last_affected == []
    _assert_close(_scores(dyn.scores()), _scores(betweenness_sampled(dyn.graph, SOURCES)))
