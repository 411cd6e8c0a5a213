"""Bucketed edge-table warehouse layout — co-located joins without shuffles.

At 100 TB the edge table is read thousands of times by iterative jobs; every
``groupBy("src")`` / self-join on the key costs a full shuffle UNLESS the
storage layout already guarantees the partitioning. Spark's answer is
bucketing: ``bucketBy(N, "src")`` hashes rows into N files per partition at
WRITE time and records the bucket spec in the catalog; any later aggregate
or equi-join on ``src`` (with matching bucket counts) is exchange-free —
tests/test_warehouse.py asserts the Exchange node is absent from the plan.

This is the persistent-layout analog of the in-session
``repartition(N, "src")`` the PageRank transition uses
(operators/pagerank.py:_transition): repartition pays the shuffle once per
session, bucketing pays it once per TABLE WRITE and every session after
that reads pre-partitioned data.

On an Iceberg catalog (the BASELINE.json input_hint deployment) the same
layout is ``PARTITIONED BY (bucket(N, src))``; the sandbox has no Iceberg
jars, so the catalog tables here use the built-in parquet bucketing, which
exercises the identical planner path (HashClusteredDistribution satisfied
by the scan).

Reference analog: NetworKit keeps the adjacency CSR-resident in RAM
(cpp/graph/Graph.h) — a bucketed table is the distributed, durable CSR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph import Graph


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist (src, dst, weight) bucketed+sorted by src into the session
    catalog. ``num_buckets`` is the long-lived layout choice — size it to the
    TARGET cluster (buckets >= max executor count you plan to scale to), not
    the writer's; readers with fewer cores coalesce buckets for free."""
    (
        edges.select("src", "dst", "weight")
        .write.bucketBy(num_buckets, "src")
        .sortBy("src", "dst")
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_graph(
    spark: SparkSession, table: str, directed: bool = False, weighted: bool = True
) -> Graph:
    """Graph over a bucketed catalog table: downstream ``groupBy("src")`` /
    src-equi-joins plan without an Exchange."""
    return Graph(spark.table(table), directed=directed, weighted=weighted)


def bucketed_out_degrees(spark: SparkSession, table: str) -> DataFrame:
    """(node, degree, wdeg) via a shuffle-free aggregate over the bucketed
    layout (the scan already satisfies the hash-clustered requirement)."""
    return (
        spark.table(table)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("degree"), F.sum("weight").alias("wdeg"))
    )


def bucketed_wedges(spark: SparkSession, table: str) -> DataFrame:
    """Out-wedge counts per source via a bucket-co-located self-join: build
    and probe sides are the SAME src-bucketed table, so the equi-join on
    ``src`` plans with zero Exchange. Returns (src, wedges) with
    wedges = d·(d-1) ordered distinct pairs — the (e,e) self-pairs are
    excluded so the count matches the strict-wedge convention the
    node-iterator triangle join uses (operators/triangles.py orders wedge
    legs strictly; d² would inflate any composed denominator)."""
    a = spark.table(table).alias("a")
    b = spark.table(table).alias("b")
    return (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.dst") != F.col("b.dst")),
        )
        .groupBy(F.col("a.src").alias("src"))
        .agg(F.count("*").alias("wedges"))
    )
