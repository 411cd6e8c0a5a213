"""k-core decomposition — iterative peeling.

Reference: /root/reference/networkit/cpp/centrality/CoreDecomposition.{h,cpp}
(ParK bucket algorithm, 323 LoC). The sequential bucket queue does not
distribute; the Spark formulation is the classic peel loop: repeatedly drop
nodes with degree < k inside the surviving subgraph (a filter + degree
recompute per round, same superstep harness as components). ``coreness``
peels at increasing k and records the level at which each node falls out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def k_core(graph: Graph, k: int, max_iter: int = 100) -> DataFrame:
    """Nodes of the k-core: maximal subgraph with min degree >= k.
    Returns (node). Fixpoint of: keep nodes with >= k surviving neighbors."""
    sym = graph.sym().select("src", "dst").filter(F.col("src") != F.col("dst")).persist()
    sym.count()
    alive = graph.nodes().localCheckpoint(eager=True)
    for _ in range(max_iter):
        surv = (
            sym.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .groupBy("src")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=True)
        )
        n_new, n_old = surv.count(), alive.count()
        alive = surv
        if n_new == n_old:
            break
    sym.unpersist()
    return alive


def coreness(graph: Graph, k_max: int | None = None) -> DataFrame:
    """(node, core): max k such that node is in the k-core
    (CoreDecomposition scores). Peels level by level — O(k_max) fixpoint
    loops; fine for web graphs whose degeneracy ≪ max degree."""
    nodes = graph.nodes()
    result = nodes.select("node", F.lit(0).alias("core"))
    k = 1
    current = graph
    while True:
        core_nodes = k_core(current, k)
        cnt = core_nodes.count()
        if cnt == 0:
            break
        result = (
            result.join(core_nodes.withColumn("ink", F.lit(1)), "node", "left")
            .select(
                "node",
                F.when(F.col("ink").isNotNull(), F.lit(k)).otherwise(F.col("core")).alias("core"),
            )
        ).localCheckpoint(eager=True)
        current = current.subgraph_from_nodes(core_nodes)
        k += 1
        if k_max is not None and k > k_max:
            break
    return result
