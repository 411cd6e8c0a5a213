"""Bucketed edge-table layout: correctness of values AND absence of the
Exchange node in the plans the bucketing is supposed to eliminate."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.warehouse import (
    bucketed_out_degrees,
    bucketed_wedges,
    read_bucketed_graph,
    write_bucketed_edges,
)
from networkit_spark.testgraph import lineitem_edges

SF_DIR = "/root/testdata/sf0.001"
TABLE = "test_edges_bucketed"


def plan_str(df):
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def bucketed(spark):
    edges = lineitem_edges(spark, SF_DIR, n_nodes=500)
    write_bucketed_edges(edges, TABLE, num_buckets=8)
    yield edges
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_bucketed_aggregate_is_exchange_free(spark, bucketed):
    deg = bucketed_out_degrees(spark, TABLE)
    p = plan_str(deg)
    assert "Exchange" not in p, p
    # values identical to the unbucketed aggregate
    ref = (
        bucketed.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("degree"), F.sum("weight").alias("wdeg"))
    )
    got = {r["node"]: (r["degree"], r["wdeg"]) for r in deg.collect()}
    want = {r["node"]: (r["degree"], r["wdeg"]) for r in ref.collect()}
    assert got == want


def test_bucketed_self_join_is_exchange_free(spark, bucketed):
    # disable auto-broadcast so the planner picks the at-scale join (SMJ):
    # with both sides bucketed on the key it must not shuffle either side
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        w = bucketed_wedges(spark, TABLE)
        p = plan_str(w)
        # plain "Exchange" (formatted mode prints the operator name alone on
        # its tree line — a compound "Exchange hashpartitioning" substring
        # can never appear there and would pass vacuously)
        assert "Exchange" not in p, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    w = bucketed_wedges(spark, TABLE)
    # wedges = d*(d-1) ordered distinct pairs (strict-wedge convention)
    deg = {
        r["src"]: r["c"]
        for r in bucketed.groupBy("src").agg(F.count("*").alias("c")).collect()
    }
    got = {r["src"]: r["wedges"] for r in w.collect()}
    assert got == {k: v * (v - 1) for k, v in deg.items()}


def test_unbucketed_same_query_needs_exchange(spark, bucketed):
    """Control: the identical aggregate over the raw DataFrame DOES plan an
    Exchange — proving the bucketing (not the data size) removed it."""
    ref = bucketed.groupBy("src").agg(F.count("*").alias("degree"))
    assert "Exchange" in plan_str(ref)


def test_bucketed_graph_roundtrip(spark, bucketed):
    g = read_bucketed_graph(spark, TABLE)
    assert g.edges.count() == bucketed.count()
    assert (
        g.edges.agg(F.sum("weight")).collect()[0][0]
        == bucketed.agg(F.sum("weight")).collect()[0][0]
    )
