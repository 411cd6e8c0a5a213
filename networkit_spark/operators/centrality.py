"""Centrality measures beyond PageRank/Katz/Eigenvector (see pagerank.py).

Reference: /root/reference/networkit/cpp/centrality/ — DegreeCentrality.cpp
:15-40, Sfigality.cpp (39 LoC), Closeness.cpp / ApproxCloseness.cpp,
ApproxBetweenness.cpp (Riondato-Kornaropoulos sampling), plus the
``Centrality.scores()/ranking()`` surface (_NetworKit.pyx:5470-5515).

Exact Brandes betweenness is a per-source DAG accumulation — O(nm) total and
driver-iterative per source; at web scale only the sampled variants are
meaningful, matching the reference's own Approx* guidance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph import Graph
from ..plans.order import zip_with_rank
from .distance import bfs_distances, multi_source_bfs


def degree_centrality(graph: Graph, normalized: bool = False) -> DataFrame:
    """DegreeCentrality.cpp:15-40: (out-)degree, optionally / (n-1)."""
    deg = graph.degrees()
    if not normalized:
        return deg.select("node", F.col("degree").cast("double").alias("score"))
    n = graph.num_nodes()
    return deg.select("node", (F.col("degree") / F.lit(float(max(n - 1, 1)))).alias("score"))


def sfigality(graph: Graph) -> DataFrame:
    """Sfigality.cpp: fraction of neighbors with strictly higher degree."""
    deg = graph.degrees()
    sym = graph.sym().select("src", "dst")
    j = (
        sym.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "ds"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dd"), "dst")
    )
    per = j.groupBy("src").agg(
        (F.sum(F.when(F.col("dd") > F.col("ds"), 1).otherwise(0)) / F.count("*")).alias("score")
    ).select(F.col("src").alias("node"), "score")
    return graph.nodes().join(per, "node", "left").select(
        "node", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def closeness_sampled(graph: Graph, sources: list[int]) -> DataFrame:
    """ApproxCloseness-style: closeness estimated from BFS distances of a
    source sample (reference ApproxCloseness.cpp uses sampled pivots).
    Returns (node, score) with score = (#samples reached) / Σ dist.

    Batched: ONE multi-source BFS carries all sources in a (source, node)
    pair frontier, so 64 samples cost ~one BFS's worth of supersteps."""
    pairs = multi_source_bfs(graph, sources)
    sums = pairs.groupBy("node").agg(
        F.sum(F.col("dist").cast("double")).alias("total"),
        F.count("*").alias("reached"),
    )
    return sums.select(
        "node",
        F.when(F.col("total") > 0, F.col("reached") / F.col("total")).otherwise(0.0).alias("score"),
    )


def betweenness_sampled(graph: Graph, sources: list[int]) -> DataFrame:
    """Sampled Brandes (ApproxBetweenness2.cpp shape): BFS shortest-path DAG
    + dependency accumulation as DataFrame supersteps over distance levels.

    Batched multi-source: sigma/delta state carries a ``source`` column, so
    each forward/backward level superstep processes EVERY sampled source at
    once — total supersteps = 2·max-eccentricity, independent of the number
    of samples (the old version looped sources serially in the driver)."""
    sym = graph.sym().select("src", "dst").persist()
    sym.count()
    dist = multi_source_bfs(graph, sources).persist()
    max_d = dist.agg(F.max("dist")).collect()[0][0] or 0
    # forward sweep: sigma(source, v) = # shortest s→v paths
    sigma = (
        dist.filter(F.col("dist") == 0)
        .select("source", "node", F.lit(1.0).alias("sigma"))
        .localCheckpoint(eager=True)
    )
    for lvl in range(1, max_d + 1):
        prev = sigma.join(dist, ["source", "node"]).filter(F.col("dist") == lvl - 1)
        nxt = (
            sym.join(
                prev.select("source", F.col("node").alias("src"), "sigma"), "src"
            )
            .select("source", F.col("dst").alias("node"), "sigma")
            .join(dist.filter(F.col("dist") == lvl), ["source", "node"], "left_semi")
            .groupBy("source", "node")
            .agg(F.sum("sigma").alias("sigma"))
        )
        sigma = sigma.unionByName(nxt).localCheckpoint(eager=True)
    # backward dependency accumulation, all sources per level superstep
    state = (
        dist.join(sigma, ["source", "node"])
        .select("source", "node", "dist", "sigma", F.lit(0.0).alias("delta"))
        .localCheckpoint(eager=True)
    )
    for lvl in range(max_d, 0, -1):
        w = state.filter(F.col("dist") == lvl).select(
            "source", F.col("node").alias("dst"),
            F.col("sigma").alias("sw"), F.col("delta").alias("dw"),
        )
        contrib = (
            sym.join(w, "dst")
            .select("source", F.col("src").alias("node"), "sw", "dw")
            .join(
                state.filter(F.col("dist") == lvl - 1).select(
                    "source", "node", F.col("sigma").alias("sv")
                ),
                ["source", "node"],
            )
            .select(
                "source", "node",
                (F.col("sv") / F.col("sw") * (1.0 + F.col("dw"))).alias("c"),
            )
            .groupBy("source", "node")
            .agg(F.sum("c").alias("c"))
        )
        state = (
            state.join(contrib, ["source", "node"], "left")
            .select(
                "source", "node", "dist", "sigma",
                (F.col("delta") + F.coalesce("c", F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
    out = (
        state.filter(F.col("node") != F.col("source"))
        .groupBy("node")
        .agg(F.sum("delta").alias("score"))
    )
    dist.unpersist()
    sym.unpersist()
    return graph.nodes().join(out, "node", "left").select(
        "node", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def ranking(scores: DataFrame, score_col: str = "score", k: int | None = None) -> DataFrame:
    """Centrality::ranking (_NetworKit.pyx:5492-5495): (rank, node, score)
    ordered by score desc, node asc.

    ``k`` set → distributed TakeOrdered (orderBy().limit(k)) — the scale path
    for top-k. Full ranking uses the distributed range-partition rank
    (plans/order.py), never a single-task global window."""
    if k is not None:
        top = scores.orderBy(F.desc(score_col), F.asc("node")).limit(k)
        # k rows: a single-partition window over the limited result is fine
        w = Window.orderBy(F.desc(score_col), F.asc("node"))
        return top.select(F.row_number().over(w).alias("rank"), "node", F.col(score_col))
    ranked = zip_with_rank(scores, [F.desc(score_col), F.asc("node")], rank_col="rank")
    return ranked.select("rank", "node", F.col(score_col))


def centralization(scores: DataFrame, score_col: str = "score") -> float:
    """Freeman centralization (Centrality::centralization surface):
    Σ (max - score) / ((n-1)·max)."""
    row = scores.agg(
        F.max(score_col).alias("mx"), F.sum(score_col).alias("s"), F.count("*").alias("n")
    ).collect()[0]
    mx, s, n = row["mx"], row["s"], row["n"]
    if not mx or n < 2:
        return 0.0
    return float((n * mx - s) / ((n - 1) * mx))


def degree_assortativity(graph: Graph) -> float:
    """Assortativity.cpp (~100 LoC): Pearson correlation of endpoint degrees
    over the (symmetric) edge set — one F.corr aggregate."""
    deg = graph.degrees()
    d1 = deg.select(F.col("node").alias("src"), F.col("degree").alias("ds"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("degree").alias("dd"))
    row = (
        graph.sym().join(d1, "src").join(d2, "dst")
        .agg(F.corr(F.col("ds").cast("double"), F.col("dd").cast("double")).alias("r"))
        .collect()[0]
    )
    return float(row["r"] or 0.0)
