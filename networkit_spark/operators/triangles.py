"""Triangle counting & clustering coefficients — degree-ordered wedge joins.

Reference: /root/reference/networkit/cpp/edgescores/TriangleEdgeScore.cpp:18-110
(orients edges by degree then intersects neighbor lists — node-iterator
bounded by arboricity, .cpp:23-26 ``isOutEdge``), and
cpp/centrality/LocalClusteringCoefficient.cpp:11-86
(c(u) = 2·tri(u)/(d(u)(d(u)-1)), .cpp:14), cpp/global/ClusteringCoefficient.cpp.

Spark plan (the relational dual of the marker-array intersection):
1. orient each undirected edge from the lower (degree, id) endpoint to the
   higher — every triangle becomes exactly one wedge at its lowest vertex;
2. wedge join: oriented ⋈ oriented on the shared lower vertex;
3. close the wedge with a join against oriented edges.
The orientation caps the join fan-out at O(arboricity) per vertex — hub
vertices of a power-law web graph only ever appear on the *high* end, so the
wedge join never explodes on them (this is the skew story at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def _oriented_with_key(graph: Graph) -> DataFrame:
    """Degree-ordered orientation carrying the dst endpoint's ordering key:
    (src, dst, ddst) rows with (deg(src),src) < (deg(dst),dst)
    (reference TriangleEdgeScore.cpp:23-26 orientation, flipped to
    low→high so wedges form at the low-degree endpoint)."""
    deg = graph.degrees()
    e = graph.sym().select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "dsrc"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "ddst"), "dst")
        .filter(
            (F.col("dsrc") < F.col("ddst"))
            | ((F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst", "ddst")
    )


def oriented_edges(graph: Graph) -> DataFrame:
    """Degree-ordered orientation: keep (u,v) with (deg(u),u) < (deg(v),v)."""
    return _oriented_with_key(graph).select("src", "dst")


def triangles(graph: Graph) -> DataFrame:
    """All triangles as (a, b, c) rows, each exactly once, a = apex (lowest
    (deg,id) vertex), and (b, c) ordered by id.

    The wedge pair is ordered by the SAME (deg,id) key used for the
    orientation, so the closing edge b→c is itself an oriented edge — the
    close is a semi-join against the oriented set, and the undirected
    edge-set build (a second sym() scan + a distinct shuffle over 2m rows)
    drops out of the plan entirely. The oriented set is persisted: it feeds
    both sides of the wedge join and the close."""
    o = _oriented_with_key(graph).persist()
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    # (ddst,dst) lexicographic: b strictly before c in orientation order
    wedges = e1.join(e2, F.col("e1.src") == F.col("e2.src")).filter(
        (F.col("e1.ddst") < F.col("e2.ddst"))
        | ((F.col("e1.ddst") == F.col("e2.ddst")) & (F.col("e1.dst") < F.col("e2.dst")))
    ).select(
        F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
    )
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    closed = wedges.join(closing, ["b", "c"], "left_semi")
    return closed.select(
        "a", F.least("b", "c").alias("b"), F.greatest("b", "c").alias("c")
    )


def triangle_count(graph: Graph) -> int:
    return triangles(graph).count()


def node_triangle_counts(graph: Graph) -> DataFrame:
    """(node, triangles): per-corner counts — each triangle credits all three
    corners (reference LocalClusteringCoefficient.cpp triangle tally)."""
    tri = triangles(graph)
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    counts = corners.groupBy("node").agg(F.count("*").alias("triangles"))
    return graph.nodes().join(counts, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def local_clustering_coefficient(graph: Graph) -> DataFrame:
    """(node, lcc): c(u) = 2·tri(u)/(d(u)(d(u)-1)), 0 for degree < 2
    (reference LocalClusteringCoefficient.cpp:14; rejects directed graphs
    .cpp:7-8 — callers should pass undirected)."""
    tri = node_triangle_counts(graph)
    deg = graph.degrees()
    return tri.join(deg, "node").select(
        "node",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(0.0)
        .alias("lcc"),
    )


def average_local_clustering_coefficient(graph: Graph) -> float:
    """ClusteringCoefficient::avgLocal (reference
    cpp/global/ClusteringCoefficient.cpp:18-108)."""
    row = local_clustering_coefficient(graph).agg(F.avg("lcc").alias("c")).collect()[0]
    return float(row["c"] or 0.0)


def global_clustering_coefficient(graph: Graph) -> float:
    """exactGlobal: 3·triangles / wedges (reference
    ClusteringCoefficient.cpp:168-218)."""
    tri = triangle_count(graph)
    deg = graph.degrees()
    wedges = deg.agg(
        F.sum(F.col("degree") * (F.col("degree") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    if not wedges:
        return 0.0
    return 3.0 * tri / wedges


def triangle_edge_score(graph: Graph) -> DataFrame:
    """(src, dst, score): #triangles each undirected edge participates in
    (reference cpp/edgescores/TriangleEdgeScore.cpp)."""
    tri = triangles(graph)
    pair = lambda u, v: F.struct(F.least(u, v).alias("x"), F.greatest(u, v).alias("y"))
    sides = (
        tri.select(pair(F.col("a"), F.col("b")).alias("e"))
        .unionByName(tri.select(pair(F.col("a"), F.col("c")).alias("e")))
        .unionByName(tri.select(pair(F.col("b"), F.col("c")).alias("e")))
    )
    counts = sides.groupBy("e").agg(F.count("*").alias("score")).select(
        F.col("e.x").alias("src"), F.col("e.y").alias("dst"), "score"
    )
    base = graph.edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    return base.join(counts, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0)).alias("score")
    )
