"""Deterministic derived graph over the driver's TPC-H-ish testdata.

Both the Spark queries and the DuckDB oracle SQL derive the SAME edge set from
``lineitem``: node ids are ``l_orderkey % N`` and ``l_partkey % N``; edge
weight is the pair multiplicity. This keeps correctness checks anchored to the
shared parquet tables with zero external fixtures (BASELINE.json input_hint's
extraction step is validated separately in tests/ on a synthesized pages
table — here the "extraction" is the modular projection itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import Graph

N_NODES_DEFAULT = 1000


def lineitem_edges(
    spark: SparkSession, sf_dir: str, n_nodes: int = N_NODES_DEFAULT, directed: bool = False
) -> DataFrame:
    """(src, dst, weight) with weight = multiplicity; undirected edges are
    canonicalized src < dst. Mirrors :func:`edges_sql` exactly."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select(
        (F.col("l_orderkey") % n_nodes).alias("a"),
        (F.col("l_partkey") % n_nodes).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    if directed:
        pairs = base.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    else:
        pairs = base.select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
    return pairs.groupBy("src", "dst").agg(
        F.count("*").cast("double").alias("weight")
    )


def lineitem_graph(
    spark: SparkSession, sf_dir: str, n_nodes: int = N_NODES_DEFAULT, directed: bool = False
) -> Graph:
    return Graph(
        lineitem_edges(spark, sf_dir, n_nodes, directed),
        directed=directed,
        weighted=True,
    )


def edges_sql(n_nodes: int = N_NODES_DEFAULT, directed: bool = False) -> str:
    """CTE body (``edges``, ``sym``, ``nodes``, ``deg``, ``wdeg``) for DuckDB,
    semantically identical to :func:`lineitem_edges`."""
    if directed:
        pair = "a AS src, b AS dst"
    else:
        pair = "LEAST(a, b) AS src, GREATEST(a, b) AS dst"
    return f"""
base AS MATERIALIZED (
  SELECT l_orderkey % {n_nodes} AS a, l_partkey % {n_nodes} AS b
  FROM lineitem
  WHERE l_orderkey % {n_nodes} <> l_partkey % {n_nodes}
),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM (SELECT {pair} FROM base) p
  GROUP BY src, dst
),
sym AS MATERIALIZED (
  SELECT src, dst, weight FROM edges
  {"" if directed else "UNION ALL SELECT dst AS src, src AS dst, weight FROM edges"}
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges
  ) u
),
deg AS MATERIALIZED (
  SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY src
),
wdeg AS MATERIALIZED (
  SELECT src AS node, SUM(weight) AS wdeg FROM sym GROUP BY src
)
"""
