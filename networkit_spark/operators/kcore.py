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
from ..plans.ckpt import clean_local_checkpoint as _cc


def k_core(graph: Graph, k: int, max_iter: int = 100) -> DataFrame:
    """Nodes of the k-core: maximal subgraph with min degree >= k.
    Returns (node). Fixpoint of: keep nodes with >= k surviving neighbors."""
    sym = graph.sym().select("src", "dst").filter(F.col("src") != F.col("dst")).persist()
    sym.count()
    alive = graph.nodes().transform(_cc)
    for _ in range(max_iter):
        surv = (
            sym.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .groupBy("src")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("src").alias("node"))
            .transform(_cc)
        )
        n_new, n_old = surv.count(), alive.count()
        alive = surv
        if n_new == n_old:
            break
    sym.unpersist()
    return alive


def coreness(graph: Graph, k_max: int | None = None) -> DataFrame:
    """(node, core): max k such that node is in the k-core
    (CoreDecomposition scores, reference ParK semantics).

    ONE peel loop with incremental degree maintenance (distributed
    Batagelj–Zaveršnik): each round removes every node whose surviving degree
    is < the current level k, records ``core = k-1`` for it, and decrements
    its surviving neighbors' degrees — each node is removed exactly once and
    each edge is decremented at most twice across the WHOLE decomposition, so
    total cost matches a single k_core fixpoint run (the old per-k restart
    was O(k_max · rounds) full-graph jobs). When a level drains, k jumps
    straight to (min surviving degree)+1, skipping empty levels."""
    sym = graph.sym().select("src", "dst").filter(F.col("src") != F.col("dst")).persist()
    sym.count()
    deg0 = sym.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    state = (
        graph.nodes()
        .join(deg0, "node", "left")
        .select("node", F.coalesce("deg", F.lit(0)).cast("long").alias("deg"))
        .transform(_cc)
    )
    cores: DataFrame | None = None
    k = 1
    while True:
        if state.isEmpty():
            break
        if k_max is not None and k > k_max:
            # report the cap for everything still alive (old behavior)
            rem = state.select("node", F.lit(k_max).alias("core"))
            cores = rem if cores is None else cores.unionByName(rem)
            break
        to_remove = state.filter(F.col("deg") < k).select("node").transform(_cc)
        wave = to_remove.count()
        if wave == 0:
            kmin = state.agg(F.min("deg")).collect()[0][0]
            k = int(kmin) + 1
            continue
        # peel waves are typically tiny vs the graph — broadcast them into
        # the decrement/removal joins explicitly (stats-clean frames are
        # never auto-broadcast); fall back to shuffle joins for huge waves
        bw = (lambda d: F.broadcast(d)) if wave <= 2_000_000 else (lambda d: d)
        rem = to_remove.select("node", F.lit(k - 1).alias("core"))
        cores = rem if cores is None else cores.unionByName(rem).transform(_cc)
        dec = (
            sym.join(bw(to_remove.withColumnRenamed("node", "src")), "src", "left_semi")
            .groupBy("dst")
            .agg(F.count("*").alias("c"))
            .select(F.col("dst").alias("node"), "c")
        )
        state = (
            state.join(bw(to_remove), "node", "left_anti")
            .join(dec, "node", "left")
            .select("node", (F.col("deg") - F.coalesce("c", F.lit(0))).alias("deg"))
            .transform(_cc)
        )
    sym.unpersist()
    if cores is None:
        return graph.nodes().select("node", F.lit(0).alias("core"))
    return cores.select("node", F.col("core").cast("int").alias("core"))
