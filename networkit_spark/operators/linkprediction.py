"""Link-prediction indices — neighbor-set joins + scalar formulas.

Reference: /root/reference/networkit/cpp/linkprediction/*.{h,cpp} and Python
networkit/linkprediction.py: CommonNeighborsIndex, JaccardIndex,
AdamicAdarIndex, ResourceAllocationIndex, PreferentialAttachmentIndex,
TotalNeighborsIndex, UDegreeIndex, VDegreeIndex, NeighborhoodDistanceIndex,
SameCommunityIndex, MissingLinksFinder, LinkThresholder.

Spark shape: all scores for a pair set are computed in ONE wedge join —
``pairs ⋈ sym(u) ⋈ sym(v)`` grouped by pair — plus degree-table joins.
At web scale the pair set is the (small) candidate side; the adjacency
stays put.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.order import zip_with_rank


def _common_neighbor_stats(graph: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, cn, aa, ra): common-neighbor count plus Adamic-Adar
    Σ 1/log(deg(z)) and Resource-Allocation Σ 1/deg(z) over shared
    neighbors z."""
    sym = graph.sym().select("src", "dst")
    deg = graph.degrees()
    nu = sym.select(F.col("src").alias("u"), F.col("dst").alias("z"))
    nv = sym.select(F.col("src").alias("v"), F.col("dst").alias("z"))
    wedges = (
        pairs.join(nu, "u")
        .join(nv, ["v", "z"])
        .join(deg.withColumnRenamed("node", "z").withColumnRenamed("degree", "dz"), "z")
    )
    stats = wedges.groupBy("u", "v").agg(
        F.count("*").alias("cn"),
        F.sum(
            F.when(F.col("dz") > 1, 1.0 / F.log(F.col("dz"))).otherwise(F.lit(0.0))
        ).alias("aa"),
        F.sum(1.0 / F.col("dz")).alias("ra"),
    )
    return pairs.join(stats, ["u", "v"], "left").select(
        "u", "v",
        F.coalesce("cn", F.lit(0)).alias("cn"),
        F.coalesce("aa", F.lit(0.0)).alias("aa"),
        F.coalesce("ra", F.lit(0.0)).alias("ra"),
    )


def link_prediction_scores(graph: Graph, pairs: DataFrame) -> DataFrame:
    """All primary indices for (u, v) pairs in one pass:
    common_neighbors, jaccard, adamic_adar, resource_allocation,
    preferential_attachment, total_neighbors, u_degree, v_degree."""
    deg = graph.degrees()
    # left-join + coalesce 0: a pair endpoint absent from the (train) graph
    # still gets a zero-score row instead of being silently dropped — matters
    # for held-out evaluation where a node may lose all its edges.
    base = (
        pairs.select("u", "v")
        .join(deg.withColumnRenamed("node", "u").withColumnRenamed("degree", "du"), "u", "left")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("degree", "dv"), "v", "left")
        .select(
            "u", "v",
            F.coalesce("du", F.lit(0)).alias("du"),
            F.coalesce("dv", F.lit(0)).alias("dv"),
        )
    )
    cn = _common_neighbor_stats(graph, pairs.select("u", "v"))
    out = base.join(cn, ["u", "v"])
    union_size = F.col("du") + F.col("dv") - F.col("cn")
    return out.select(
        "u", "v",
        F.col("cn").alias("common_neighbors"),
        F.when(union_size > 0, F.col("cn") / union_size).otherwise(0.0).alias("jaccard"),
        F.col("aa").alias("adamic_adar"),
        F.col("ra").alias("resource_allocation"),
        (F.col("du") * F.col("dv")).alias("preferential_attachment"),
        union_size.alias("total_neighbors"),
        F.col("du").alias("u_degree"),
        F.col("dv").alias("v_degree"),
        F.when(
            F.col("du") * F.col("dv") > 0,
            F.col("cn") / F.sqrt(F.col("du") * F.col("dv")),
        ).otherwise(0.0).alias("neighborhood_distance"),
    )


def random_link_sampler(graph: Graph, fraction: float, seed: int = 42) -> Graph:
    """RandomLinkSampler analog: keep a deterministic hash-sampled fraction of
    edges (partitioning-independent, unlike ``df.sample``)."""
    keep = graph.edges.filter(
        (F.abs(F.xxhash64("src", "dst", F.lit(seed))) % 1_000_000)
        < int(fraction * 1_000_000)
    )
    return Graph(keep, directed=graph.directed, weighted=graph.weighted)


def evaluate_predictions(
    scores: DataFrame, truth: DataFrame, score_col: str = "score"
) -> dict:
    """ROCMetric / PrecisionRecallMetric analog
    (reference cpp/linkprediction/EvaluationMetric.h): ranks predictions by
    score desc and returns AUC-ROC and average precision against a truth set
    of (u, v) positive pairs.

    Distributed: exact global rank + running positive count come from the
    range-partitioned rank (plans/order.py) — each task sorts only its score
    range, no single-task global window. Only the two scalar integrals come
    back to the driver."""
    t = truth.select("u", "v", F.lit(1).alias("pos"))
    ranked = (
        scores.join(t, ["u", "v"], "left")
        .select("u", "v", score_col, F.coalesce("pos", F.lit(0)).alias("pos"))
    )
    n_pos = ranked.agg(F.sum("pos")).collect()[0][0] or 0
    n_tot = ranked.count()
    n_neg = n_tot - n_pos
    if n_pos == 0 or n_neg == 0:
        return {"auc_roc": 0.0, "average_precision": 0.0}
    cum = zip_with_rank(
        ranked,
        [F.desc(score_col), F.asc("u"), F.asc("v")],
        rank_col="rank",
        cum_cols=["pos"],
    ).select("pos", "rank", F.col("cum_pos").alias("tp"))
    # AUC via rank-sum (Mann-Whitney U): deterministic given the tie-break
    agg = cum.filter(F.col("pos") == 1).agg(
        F.sum("rank").alias("rs"), F.avg(F.col("tp") / F.col("rank")).alias("ap")
    ).collect()[0]
    auc = 1.0 - (agg["rs"] - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return {"auc_roc": float(auc), "average_precision": float(agg["ap"] or 0.0)}


def missing_links(graph: Graph, k_hop: int = 2, limit_nodes: DataFrame | None = None) -> DataFrame:
    """MissingLinksFinder (MissingLinksFinder.cpp:19-67): canonical (u, v)
    pairs at EXACT BFS distance ``k_hop`` — findFromNode's layered BFS
    (visited excludes anything closer), relationally: pair-frontier
    expansion with a seen-minus per layer. ``limit_nodes`` restricts the
    BFS SOURCES; pairs are canonicalized least/greatest AFTER generation,
    so a candidate incident to a limited node survives regardless of which
    endpoint has the smaller id (a pre-canonical ``u < v`` filter would
    silently drop every partner with a smaller id than the limited node)."""
    from ..plans.ckpt import clean_local_checkpoint as _cc

    sym = graph.sym().select("src", "dst")
    if limit_nodes is not None:
        start = limit_nodes.select(
            F.col(limit_nodes.columns[0]).alias("u")
        )
    else:
        start = graph.nodes().select(F.col("node").alias("u"))
    seen = start.select("u", F.col("u").alias("v"))
    frontier = seen
    for _ in range(k_hop):
        nxt = (
            frontier.join(sym, frontier["v"] == sym["src"])
            .select("u", F.col("dst").alias("v"))
            .distinct()
        )
        frontier = nxt.join(seen, ["u", "v"], "left_anti").transform(_cc)
        seen = seen.unionByName(frontier).transform(_cc)
    return (
        frontier.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )


def same_community_index(labels: DataFrame, pairs: DataFrame) -> DataFrame:
    """SameCommunityIndex: 1.0 iff both endpoints share a community label."""
    lu = labels.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    lv = labels.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    return pairs.join(lu, "u").join(lv, "v").select(
        "u", "v",
        F.when(F.col("lu") == F.col("lv"), 1.0).otherwise(0.0).alias("same_community"),
    )


def link_thresholder(scores: DataFrame, score_col: str, threshold: float) -> DataFrame:
    """LinkThresholder: keep pairs with score >= threshold."""
    return scores.filter(F.col(score_col) >= threshold)


def top_predictions(scores: DataFrame, score_col: str, k: int) -> DataFrame:
    """PredictionsSorter: global top-k by (score desc, u, v) — deterministic."""
    return scores.orderBy(F.desc(score_col), F.asc("u"), F.asc("v")).limit(k)


def katz_index(
    graph: Graph,
    pairs: DataFrame,
    beta: float = 0.005,
    max_len: int = 5,
) -> DataFrame:
    """KatzIndex (cpp/linkprediction/KatzIndex.cpp): score(u, v) =
    Σ_{l=1..max_len} beta^l · |paths of length l between u and v|.

    The reference runs a bounded BFS per query pair; the distributed analog
    batches EVERY distinct source u of the pair set into one walk-count
    state (source, node, count) and does max_len sparse-multiply supersteps
    against the adjacency — the same (source, node) pair-frontier shape as
    multi_source_bfs, so 10^4 query pairs cost max_len supersteps total,
    not per pair. Returns (u, v, score)."""
    sym = graph.sym().select("src", "dst").persist()
    srcs = pairs.select(F.col("u").alias("source")).distinct()
    walks = srcs.select(
        "source", F.col("source").alias("node"), F.lit(1.0).alias("cnt")
    ).localCheckpoint(eager=True)
    acc = None
    for l in range(1, max_len + 1):
        walks = (
            sym.join(walks, sym.src == walks.node)
            .groupBy("source", "dst")
            .agg(F.sum("cnt").alias("cnt"))
            .select("source", F.col("dst").alias("node"), "cnt")
            .localCheckpoint(eager=True)
        )
        lvl = walks.select(
            "source", "node", (F.lit(beta ** l) * F.col("cnt")).alias("s")
        )
        acc = lvl if acc is None else acc.unionByName(lvl)
    sym.unpersist()
    scores = acc.groupBy("source", "node").agg(F.sum("s").alias("score"))
    return (
        pairs.join(
            scores,
            (pairs.u == scores.source) & (pairs.v == scores.node),
            "left",
        )
        .select("u", "v", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
