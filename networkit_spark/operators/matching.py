"""Distributed greedy matching — mutual-heaviest-edge supersteps.

Reference: /root/reference/networkit/cpp/matching/LocalMaxMatcher.{h,cpp}
(~150 LoC, sequential local-max): repeatedly add edges that are the heaviest
incident edge of BOTH endpoints, remove matched vertices, iterate. The
mutual-local-max rule is order-independent, so the distributed superstep
version computes the same matching as the sequential one for distinct
weights; ties break deterministically by (weight, src, dst).

This is the classic "handshake" algorithm: each round every unmatched vertex
points at its best incident edge; edges pointed at from both sides join the
matching. Converges in O(log m) rounds w.h.p.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def local_max_matching(graph: Graph, max_iter: int = 100) -> DataFrame:
    """Returns matching edges (src, dst, weight), src < dst."""
    edges = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    matched = None
    for _ in range(max_iter):
        if edges.isEmpty():
            break
        # each endpoint's best incident edge: heaviest, tie-break (src, dst)
        incident = edges.select(
            F.col("src").alias("node"), "src", "dst", "weight"
        ).unionByName(
            edges.select(F.col("dst").alias("node"), "src", "dst", "weight")
        )
        best = (
            incident.groupBy("node")
            .agg(
                F.max_by(
                    F.struct("src", "dst", "weight"),
                    F.struct(
                        F.col("weight"), (-F.col("src")).alias("ns"), (-F.col("dst")).alias("nd")
                    ),
                ).alias("e")
            )
            .select("node", F.col("e.src").alias("src"), F.col("e.dst").alias("dst"), F.col("e.weight").alias("weight"))
        )
        # an edge both of whose endpoints chose it is locally dominant
        picked = (
            best.groupBy("src", "dst", "weight")
            .agg(F.count("*").alias("votes"))
            .filter(F.col("votes") == 2)
            .select("src", "dst", "weight")
            .localCheckpoint(eager=True)
        )
        if picked.isEmpty():
            break
        matched = (
            picked
            if matched is None
            else matched.unionByName(picked).localCheckpoint(eager=True)
        )
        # drop all edges incident to newly-matched vertices
        mnodes = picked.select(F.col("src").alias("node")).unionByName(
            picked.select(F.col("dst").alias("node"))
        ).distinct()
        edges = (
            edges.join(mnodes.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(mnodes.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight")
            .localCheckpoint(eager=True)
        )
    if matched is None:
        return graph.edges.limit(0)
    return matched


def matching_weight(matching: DataFrame) -> float:
    row = matching.agg(F.sum("weight").alias("w")).collect()[0]
    return float(row["w"] or 0.0)


def is_proper_matching(matching: DataFrame) -> bool:
    """No vertex appears twice (Matching::isProper analog)."""
    nodes = matching.select(F.col("src").alias("node")).unionByName(
        matching.select(F.col("dst").alias("node"))
    )
    return nodes.count() == nodes.distinct().count()


def matching_coarsening(
    graph: Graph, matching: DataFrame, no_self_loops: bool = False
) -> tuple:
    """Contract matched pairs to super-nodes — reference
    cpp/coarsening/MatchingCoarsening.cpp:16-48: coarse node = the matched
    pair {v, mate} (carried over under the smaller id; the reference
    additionally renumbers densely, an arbitrary-bijection difference),
    unmatched nodes carry over unchanged; parallel coarse edges sum their
    weights. Returns ``(coarse_graph, fine_to_coarse)`` with fine_to_coarse
    = (node, coarse) rows.

    One label join + groupBy — same shape as community.coarsen.
    """
    from .community import coarsen

    pairs = matching.select("src", "dst")
    to_rep = pairs.select(
        F.col("src").alias("node"), F.col("src").alias("coarse")
    ).unionByName(
        pairs.select(F.col("dst").alias("node"), F.col("src").alias("coarse"))
    )
    fine_to_coarse = (
        graph.nodes()
        .join(to_rep, "node", "left")
        .select("node", F.coalesce("coarse", F.col("node")).alias("coarse"))
    )
    cg = coarsen(graph, fine_to_coarse.withColumnRenamed("coarse", "label"))
    if no_self_loops:
        cg = Graph(
            cg.edges.filter(F.col("src") != F.col("dst")),
            directed=cg.directed,
            weighted=True,
        )
    return cg, fine_to_coarse
