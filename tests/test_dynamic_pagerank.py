"""DynPageRank: warm-started incremental PageRank must equal a from-scratch
recompute after every event batch (power iteration has a unique fixpoint, so
warm == cold at tolerance), and the warm restart must converge in fewer
supersteps than the cold run it replaces."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.streaming.dynamic import DynPageRank
from networkit_spark.streaming.graph_events import EVENT_SCHEMA


def _graph(spark, edges, directed=True):
    df = spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in edges], "src long, dst long, weight double"
    )
    return Graph(df, directed=directed, weighted=True)


def _events(spark, evs, seq0=0):
    rows = [
        (seq0 + i, t, int(u), int(v), float(w), None)
        for i, (t, u, v, w) in enumerate(evs)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _scores(df):
    return {r["node"]: r["score"] for r in df.collect()}


BASE = [
    (0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0), (3, 4, 1.0),
    (4, 2, 1.0), (4, 5, 1.0), (5, 0, 1.0), (1, 5, 1.0), (5, 6, 1.0),
    (6, 0, 1.0),
]


def test_dynpagerank_matches_recompute(spark):
    d = DynPageRank(_graph(spark, BASE), tol=1e-10)
    batches = [
        [("EDGE_ADDITION", 3, 6, 1.0), ("EDGE_ADDITION", 6, 2, 1.0)],
        [("EDGE_REMOVAL", 1, 5, 0.0)],
        [("EDGE_WEIGHT_UPDATE", 2, 3, 4.0), ("EDGE_ADDITION", 0, 4, 1.0)],
    ]
    seq = 0
    for batch in batches:
        d.update(_events(spark, batch, seq0=seq))
        seq += len(batch)
        fresh = _scores(pagerank(d.graph, tol=1e-10))
        warm = _scores(d.scores)
        assert set(fresh) == set(warm)
        for node, s in fresh.items():
            assert warm[node] == pytest.approx(s, abs=1e-7), node
        assert abs(sum(warm.values()) - 1.0) < 1e-9


def test_dynpagerank_warm_start_converges_faster(spark):
    d = DynPageRank(_graph(spark, BASE), tol=1e-10)
    cold_iters = d.iterations
    d.update(_events(spark, [("EDGE_ADDITION", 3, 6, 1.0)]))
    assert d.iterations is not None and cold_iters is not None
    # one added arc on an 11-arc graph: the warm restart re-converges in
    # strictly fewer supersteps than the cold run
    assert d.iterations < cold_iters


def test_dynpagerank_node_arrival_and_departure(spark):
    d = DynPageRank(_graph(spark, BASE), tol=1e-10)
    # node 7 arrives; node 6 loses its only arcs (departs the node set)
    d.update(
        _events(
            spark,
            [
                ("EDGE_ADDITION", 7, 0, 1.0),
                ("EDGE_ADDITION", 2, 7, 1.0),
                ("EDGE_REMOVAL", 5, 6, 0.0),
                ("EDGE_REMOVAL", 6, 0, 0.0),
            ],
        )
    )
    fresh = _scores(pagerank(d.graph, tol=1e-10))
    warm = _scores(d.scores)
    assert set(fresh) == set(warm)
    assert 7 in warm and 6 not in warm
    for node, s in fresh.items():
        assert warm[node] == pytest.approx(s, abs=1e-7), node
