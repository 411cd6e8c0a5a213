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


def oriented_edges(graph: Graph) -> DataFrame:
    """Degree-ordered orientation: keep (u,v) with (deg(u),u) < (deg(v),v)
    (reference TriangleEdgeScore.cpp:23-26 orientation, flipped to
    low→high so wedges form at the low-degree endpoint)."""
    deg = graph.degrees()
    e = graph.sym().select("src", "dst").filter(F.col("src") != F.col("dst"))
    e = (
        e.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "dsrc"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "ddst"), "dst")
        .filter(
            (F.col("dsrc") < F.col("ddst"))
            | ((F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )
    return e


def triangles(graph: Graph) -> DataFrame:
    """All triangles as (a, b, c) rows, each exactly once, a = apex (lowest
    (deg,id) vertex), and (b, c) ordered by id."""
    o = oriented_edges(graph)
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    wedges = e1.join(e2, F.col("e1.src") == F.col("e2.src")).filter(
        F.col("e1.dst") < F.col("e2.dst")
    ).select(
        F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
    )
    # close the wedge: (b,c) must be an edge; orientation of (b,c) is unknown
    # relative to (deg,id) order of b vs c, so check the undirected edge set
    # canonicalized by id (cheaper than re-deriving order).
    und = (
        graph.sym()
        .select(F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y"))
        .filter(F.col("x") != F.col("y"))
        .distinct()
    )
    return wedges.join(
        und, (wedges.b == und.x) & (wedges.c == und.y), "left_semi"
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
