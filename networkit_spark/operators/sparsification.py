"""Edge sparsification — score edges, filter by global threshold.

Reference: /root/reference/networkit/cpp/sparsification/ (Sparsifiers.h:
23-160) + networkit/sparsification.py: edge scorers (TriangleEdgeScore-based
Simmelian variants, LocalDegreeScore, LocalSimilarityScore, RandomEdgeScore)
feeding ``GlobalThresholdFilter`` (GlobalThresholdFilter.cpp) =
``edges.filter(score >= t)``. Also edgescores/: PrefixJaccardScore,
GeometricMeanScore, EdgeScoreNormalizer/Blender/Linearizer/AsWeight.

Everything is relational: one triangle/wedge join for the structural scores,
then column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _ffcc
from ..plans.iterate import _free_checkpoint_blocks as _free_ck
from .triangles import triangle_edge_score


def jaccard_similarity_score(graph: Graph) -> DataFrame:
    """(src, dst, score): Jaccard of endpoint neighborhoods =
    tri(e) / (deg(u) + deg(v) - tri(e) - 2) — the SCAN structural similarity
    shape (SCANStructuralSimilarityScore) from the per-edge triangle count."""
    tri = triangle_edge_score(graph)
    deg = graph.degrees()
    j = (
        tri.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dv"), "dst")
    )
    denom = F.col("du") + F.col("dv") - F.col("score") - 2
    return j.select(
        "src", "dst",
        F.when(denom > 0, F.col("score") / denom).otherwise(0.0).alias("score"),
    )


def local_degree_score(graph: Graph) -> DataFrame:
    """LocalDegreeScore: rank of the edge within each endpoint's adjacency by
    the OTHER endpoint's degree; score = 1 - log(rank)/log(deg) (keeps
    hub-to-hub backbone edges)."""
    deg = graph.degrees()
    sym = graph.sym().select("src", "dst")
    ranked = (
        sym.join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dd"), "dst")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("dd"), F.asc("dst"))
            ),
        )
        .join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "ds"), "src")
        .select(
            "src", "dst",
            F.when(
                F.col("ds") > 1,
                1.0 - F.log(F.col("rnk").cast("double")) / F.log(F.col("ds").cast("double")),
            ).otherwise(1.0).alias("s"),
        )
    )
    canon = ranked.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"), "s"
    )
    return canon.groupBy("src", "dst").agg(F.max("s").alias("score"))


def scan_structural_score(graph: Graph) -> DataFrame:
    """SCANStructuralSimilarityScore: (tri(e) + 2) / sqrt((du+1)(dv+1)) —
    cosine of closed neighborhoods (endpoints included), per the SCAN
    definition (reference cpp/sparsification/SCANStructuralSimilarityScore)."""
    tri = triangle_edge_score(graph)
    deg = graph.degrees()
    j = (
        tri.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dv"), "dst")
    )
    return j.select(
        "src", "dst",
        (
            (F.col("score") + 2)
            / F.sqrt((F.col("du") + 1.0) * (F.col("dv") + 1.0))
        ).alias("score"),
    )


def geometric_mean_score(graph: Graph, scores: DataFrame) -> DataFrame:
    """GeometricMeanScore (cpp/edgescores/GeometricMeanScore.cpp): normalize
    each edge score by the geometric mean of its endpoints' total incident
    score mass: s(e) / sqrt(S(u) * S(v))."""
    both = scores.select(F.col("src").alias("node"), "score").unionByName(
        scores.select(F.col("dst").alias("node"), "score")
    )
    totals = both.groupBy("node").agg(F.sum("score").alias("tot"))
    j = (
        scores.join(totals.withColumnRenamed("node", "src").withColumnRenamed("tot", "tu"), "src")
        .join(totals.withColumnRenamed("node", "dst").withColumnRenamed("tot", "tv"), "dst")
    )
    return j.select(
        "src", "dst",
        F.when(
            F.col("tu") * F.col("tv") > 0,
            F.col("score") / F.sqrt(F.col("tu") * F.col("tv")),
        ).otherwise(0.0).alias("score"),
    )


def local_similarity_score(graph: Graph) -> DataFrame:
    """LocalSimilarityScore: per endpoint, rank incident edges by structural
    (Jaccard) similarity desc; edge score = 1 - log(rank)/log(deg), max over
    the two endpoints — keeps each node's locally most-similar neighbors
    (reference cpp/sparsification/LocalSimilarityScore.cpp shape)."""
    sim = jaccard_similarity_score(graph)
    both = sim.unionByName(
        sim.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "score")
    )
    deg = graph.degrees()
    ranked = (
        both.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
            ),
        )
        .join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "ds"), "src")
        .select(
            "src", "dst",
            F.when(
                F.col("ds") > 1,
                1.0 - F.log(F.col("rnk").cast("double")) / F.log(F.col("ds").cast("double")),
            ).otherwise(1.0).alias("s"),
        )
    )
    canon = ranked.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"), "s"
    )
    return canon.groupBy("src", "dst").agg(F.max("s").alias("score"))


def random_edge_score(graph: Graph, seed: int = 42) -> DataFrame:
    """RandomEdgeScore — deterministic hash-uniform in [0,1) per edge."""
    return graph.edges.select(
        "src", "dst",
        ((F.abs(F.xxhash64("src", "dst", F.lit(seed))) % F.lit(2 ** 53)).cast("double")
         / F.lit(float(2 ** 53))).alias("score"),
    )


def simmelian_overlap_score(graph: Graph, max_rank: int = 10) -> DataFrame:
    """SimmelianOverlapScore (non-parametric): overlap of the top-``max_rank``
    strongest ties (by per-edge triangle count) of both endpoints."""
    tri = triangle_edge_score(graph)
    both = tri.unionByName(
        tri.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "score")
    )
    ranked = both.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))),
    ).filter(F.col("rnk") <= max_rank)
    nu = ranked.select(F.col("src").alias("u"), F.col("dst").alias("z"))
    nv = ranked.select(F.col("src").alias("v"), F.col("dst").alias("z"))
    pairs = graph.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    overlap = (
        pairs.join(nu, "u").join(nv, ["v", "z"]).groupBy("u", "v").agg(F.count("*").alias("ov"))
    )
    return pairs.join(overlap, ["u", "v"], "left").select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.coalesce("ov", F.lit(0)).cast("double").alias("score"),
    )


def normalize_score(scores: DataFrame, invert: bool = False) -> DataFrame:
    """EdgeScoreNormalizer: min-max normalize to [0,1]."""
    row = scores.agg(F.min("score").alias("lo"), F.max("score").alias("hi")).collect()[0]
    lo, hi = row["lo"], row["hi"]
    span = (hi - lo) or 1.0
    norm = (F.col("score") - lo) / span
    return scores.select("src", "dst", (1.0 - norm if invert else norm).alias("score"))


def blend_scores(a: DataFrame, b: DataFrame, weight_a: float = 0.5) -> DataFrame:
    """EdgeScoreBlender: convex combination of two edge scores."""
    bb = b.withColumnRenamed("score", "score_b")
    return a.join(bb, ["src", "dst"]).select(
        "src", "dst",
        (F.lit(weight_a) * F.col("score") + F.lit(1 - weight_a) * F.col("score_b")).alias("score"),
    )


def score_as_weight(graph: Graph, scores: DataFrame) -> Graph:
    """EdgeScoreAsWeight: replace edge weights with scores."""
    e = graph.edges.drop("weight").join(scores, ["src", "dst"]).select(
        "src", "dst", F.col("score").alias("weight")
    )
    return Graph(e, directed=graph.directed, weighted=True)


def global_threshold_filter(
    graph: Graph, scores: DataFrame, threshold: float, above: bool = True
) -> Graph:
    """GlobalThresholdFilter.cpp: keep edges with score >= (or <) t."""
    cond = F.col("score") >= threshold if above else F.col("score") < threshold
    kept = graph.edges.join(scores.filter(cond).select("src", "dst"), ["src", "dst"], "left_semi")
    return Graph(kept, directed=graph.directed, weighted=graph.weighted)


def sparsify_to_ratio(
    graph: Graph, scores: DataFrame, target_ratio: float
) -> Graph:
    """Parametric sparsifier surface (Sparsifiers.h getSparsifiedGraphOfSize):
    keep the top ``target_ratio`` fraction of edges by score via an
    approx-quantile threshold (single pass, no global sort)."""
    t = scores.stat.approxQuantile("score", [1.0 - target_ratio], 0.001)[0]
    return global_threshold_filter(graph, scores, t)


def prefix_jaccard_score(graph: Graph, k: int = 10, attr: DataFrame | None = None) -> DataFrame:
    """PrefixJaccardScore (cpp/edgescores/PrefixJaccardScore.cpp): per edge
    (u, v), the Jaccard overlap of u's and v's TOP-k neighbor prefixes,
    neighbors ranked by ``attr`` (node, rank_value; default = degree)
    descending with node-id tie-break.

    The per-node prefix is a Window PARTITIONED BY the node (each task ranks
    one adjacency list — never a global sort); the intersection is one
    equi-join on the shared neighbor. Returns (src, dst, score)."""
    if attr is None:
        attr = graph.degrees().select("node", F.col("degree").cast("double").alias("rv"))
    else:
        attr = attr.select("node", F.col(attr.columns[1]).cast("double").alias("rv"))
    nb = graph.sym().select("src", "dst").join(
        attr.select(F.col("node").alias("dst"), "rv"), "dst"
    )
    w = Window.partitionBy("src").orderBy(F.desc("rv"), F.asc("dst"))
    prefix = (
        nb.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .persist()
    )
    sizes = prefix.groupBy("node").agg(F.count("*").alias("sz"))
    e = graph.edges.select("src", "dst")
    inter = (
        e.join(prefix.select(F.col("node").alias("src"), "nbr"), "src")
        .join(
            prefix.select(F.col("node").alias("dst"), F.col("nbr").alias("nbr")),
            ["dst", "nbr"],
            "left_semi",
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("ix"))
    )
    out = (
        e.join(inter, ["src", "dst"], "left")
        .join(sizes.select(F.col("node").alias("src"), F.col("sz").alias("su")), "src", "left")
        .join(sizes.select(F.col("node").alias("dst"), F.col("sz").alias("sv")), "dst", "left")
        .select(
            "src", "dst",
            F.coalesce("ix", F.lit(0)).alias("ix"),
            (F.coalesce("su", F.lit(0)) + F.coalesce("sv", F.lit(0))).alias("tot"),
        )
        .select(
            "src", "dst",
            F.when(
                F.col("tot") - F.col("ix") > 0,
                F.col("ix") / (F.col("tot") - F.col("ix")),
            ).otherwise(0.0).alias("score"),
        )
    )
    return out


def quadrangle_edge_score(graph: Graph) -> DataFrame:
    """ChibaNishizekiQuadrangleEdgeScore
    (cpp/edgescores/ChibaNishizekiQuadrangleEdgeScore.cpp): number of
    4-cycles each edge participates in.

    Relational identity: a 4-cycle through edge (u, v) is a neighbor
    w ∈ N(v)\\{u} plus a common neighbor x of u and w with x ≠ v; since
    v itself is always one common neighbor of (u, w) when w ~ v, the count
    is Σ_{w ∈ N(v), w≠u} (cn(u, w) − 1) with cn = common-neighbor counts
    from one wedge join (the same distance-2 aggregation class as triangle
    counting; orient by degree at scale to bound the wedge side).
    Returns (src, dst, score) over the undirected edge list."""
    sym = graph.sym().select("src", "dst").persist()
    # cn(a, b): # common neighbors, for unordered pairs reachable in 2 hops
    wedge = (
        sym.select(F.col("src").alias("a"), F.col("dst").alias("x"))
        .join(sym.select(F.col("src").alias("x"), F.col("dst").alias("b")), "x")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cn"))
        .persist()
    )
    # per directed edge (u, v): sum over w ~ v of (cn(u, w) - 1), w != u
    uvw = (
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(sym.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v")
        .filter(F.col("w") != F.col("u"))
        .select(
            "u", "v",
            F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b"),
        )
    )
    per_dir = (
        uvw.join(wedge, ["a", "b"], "left")
        .select("u", "v", (F.coalesce("cn", F.lit(0)) - 1).alias("q"))
        .groupBy("u", "v")
        .agg(F.sum("q").alias("quads"))
    )
    e = graph.edges.select("src", "dst")
    out = (
        e.join(
            per_dir.select(F.col("u").alias("src"), F.col("v").alias("dst"), "quads"),
            ["src", "dst"],
            "left",
        )
        .select("src", "dst", F.coalesce("quads", F.lit(0)).cast("long").alias("score"))
    )
    sym.unpersist()
    return out


def chance_corrected_triangle_score(graph: Graph) -> DataFrame:
    """ChanceCorrectedTriangleScore (reference
    cpp/sparsification/ChanceCorrectedTriangleScore.cpp:22-29): per-edge
    triangle count corrected for the count expected by chance between
    endpoints of the observed degrees:

        t > 0              -> t * (n - 2) / ((du - 1) * (dv - 1))
        t = 0, leaf endpoint -> 1.0
        otherwise          -> 0.0

    One triangle join + two degree joins; all whole-stage-codegen arithmetic.
    """
    n = graph.num_nodes()
    deg = graph.degrees()
    tri = triangle_edge_score(graph).withColumnRenamed("score", "tri")
    j = (
        graph.edges.select("src", "dst")
        .join(tri, ["src", "dst"], "left")
        .join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dv"), "dst")
        .select("src", "dst", F.coalesce("tri", F.lit(0)).alias("tri"), "du", "dv")
    )
    return j.select(
        "src", "dst",
        F.when(
            F.col("tri") > 0,
            F.col("tri") * F.lit(float(n - 2))
            / ((F.col("du") - 1.0) * (F.col("dv") - 1.0)),
        )
        .when((F.col("du") == 1) | (F.col("dv") == 1), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("score"),
    )


def multiscale_score(graph: Graph) -> DataFrame:
    """MultiscaleScore (reference cpp/sparsification/MultiscaleScore.cpp:
    24-50, getProbability :63-65; Serrano et al. multiscale backbone): per
    endpoint u, normalize incident edge weights p = w / sum_w(u); the edge's
    significance from u's perspective is 1 - (1 - p)^(deg(u) - 1); the score
    is the max over the two endpoint perspectives.

    Window-per-node (partitionBy src over the symmetric view — never global),
    then a canonical-pair max aggregation: two shuffles total.
    """
    sym = graph.sym().select("src", "dst", "weight")
    w = Window.partitionBy("src")
    per_dir = sym.select(
        "src", "dst",
        (F.col("weight") / F.sum("weight").over(w)).alias("p"),
        F.count(F.lit(1)).over(w).alias("k"),
    ).select(
        "src", "dst",
        (1.0 - F.pow(1.0 - F.col("p"), F.col("k") - F.lit(1.0))).alias("s"),
    )
    canon = per_dir.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "s",
    )
    return canon.groupBy("src", "dst").agg(F.max("s").alias("score"))


def forest_fire_score(
    graph: Graph,
    pf: float = 0.6,
    target_burnt_ratio: float = 2.0,
    fires_per_wave: int = 32,
    max_steps: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ForestFireScore (reference cpp/sparsification/ForestFireScore.cpp:
    19-88): repeatedly ignite fires at random nodes; each fire spreads to
    random unvisited neighbors; an edge's score is its burn count normalized
    by the maximum burn count.

    Distributed adaptation (documented deviation): the reference burns a
    Geometric(1-pf)-truncated number of neighbors per active node from a
    single sequential fire; here WAVES of ``fires_per_wave`` independent
    fires run simultaneously as one (fire, node) frontier DataFrame, and each
    active node burns each unvisited neighbor independently with probability
    ``pf`` (Binomial rather than Geometric fan-out — same expected spread
    direction, fully data-parallel). All randomness is seeded xxhash64 so the
    result is deterministic and partitioning-independent. Waves repeat until
    ``target_burnt_ratio * m`` edge-burns accumulate, matching the
    reference's stopping rule.
    """
    sym = graph.sym().select("src", "dst").persist()
    m = graph.num_edges()
    target = target_burnt_ratio * m
    u01 = lambda *cols: (
        (F.abs(F.xxhash64(*cols)) % F.lit(2 ** 53)).cast("double")
        / F.lit(float(2 ** 53))
    )

    nodes = graph.nodes()
    burnt_acc = None  # (src, dst, burns) canonical
    total_burnt = 0
    wave = 0

    while total_burnt < target and wave < 64:
        # ignite: fires_per_wave hash-selected distinct start nodes
        starts = (
            nodes.withColumn("h", u01(F.col("node"), F.lit(seed), F.lit(wave)))
            .orderBy("h", "node")
            .limit(fires_per_wave)
            .select(F.xxhash64("node", F.lit(wave)).alias("fire"), "node")
        )
        # per-wave cache lifecycle: frames are materialized via the
        # stats-clean checkpoint and superseded ones released immediately —
        # a 64-wave run previously pinned every per-step visited/cand frame
        # for the session lifetime
        visited = _ffcc(starts.select("fire", "node"))
        frontier = visited
        wave_burns = None
        step_frames = []
        for step in range(max_steps):
            cand = _ffcc(
                frontier.join(sym, frontier["node"] == sym["src"])
                .select("fire", "src", "dst")
                .join(
                    visited.withColumnRenamed("node", "dst"),
                    ["fire", "dst"],
                    "left_anti",
                )
                .filter(
                    u01(F.col("fire"), F.col("src"), F.col("dst"),
                        F.lit(seed), F.lit(step)) < pf
                )
            )
            burns = cand.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            ).groupBy("src", "dst").agg(F.count(F.lit(1)).alias("burns"))
            wave_burns = burns if wave_burns is None else (
                wave_burns.unionByName(burns)
                .groupBy("src", "dst").agg(F.sum("burns").alias("burns"))
            )
            new_front = cand.select("fire", F.col("dst").alias("node")).distinct()
            old_visited = visited
            visited = _ffcc(visited.unionByName(new_front))
            step_frames.extend((cand, old_visited))
            frontier = new_front
            if frontier.isEmpty():
                break
        if wave_burns is not None:
            wave_burns = _ffcc(wave_burns)
            total_burnt += wave_burns.agg(F.sum("burns")).collect()[0][0] or 0
            old_acc = burnt_acc
            burnt_acc = wave_burns if burnt_acc is None else _ffcc(
                burnt_acc.unionByName(wave_burns)
                .groupBy("src", "dst").agg(F.sum("burns").alias("burns"))
            )
            if old_acc is not None:
                _free_ck(old_acc)
            if burnt_acc is not wave_burns:
                _free_ck(wave_burns)
        for df_ in step_frames + [visited]:
            _free_ck(df_)
        wave += 1
    sym.unpersist()
    edges = graph.edges.select("src", "dst")
    if burnt_acc is None:
        return edges.withColumn("score", F.lit(0.0))
    mx = burnt_acc.agg(F.max("burns")).collect()[0][0] or 1
    return (
        edges.join(burnt_acc, ["src", "dst"], "left")
        .select(
            "src", "dst",
            (F.coalesce("burns", F.lit(0)) / F.lit(float(mx))).alias("score"),
        )
    )


def random_node_edge_score(
    graph: Graph, rne_ratio: float = 0.5, seed: int = 42
) -> DataFrame:
    """RandomNodeEdgeScore (reference
    cpp/sparsification/RandomNodeEdgeScore.cpp:21-63): edges are removed one
    at a time — with probability ``rne_ratio`` by picking a random node then
    a random incident edge (degree-biased), else uniformly — and an edge's
    score is its removal rank / m.

    Distributed adaptation (documented deviation): the sequential removal
    order is replaced by a single exponential race. Each edge draws a
    removal time Exp(rate_e) with

        rate_e = (1 - rne_ratio) * 1/m + rne_ratio * (1/deg(u) + 1/deg(v)) / n

    — the stationary per-step pick probability of the reference's mixture —
    via the inverse-CDF of a seeded hash-uniform. The score is the exact
    global rank of the removal time (range-partitioned rank, no single-task
    sort) divided by m. Degree-biased and uniform regimes match the
    reference's in expectation; the evolving-degree feedback of the
    sequential process is not modeled.
    """
    from ..plans.order import zip_with_rank

    m = graph.num_edges()
    n = graph.num_nodes()
    deg = graph.degrees()
    u01 = (
        (F.abs(F.xxhash64("src", "dst", F.lit(seed))) % F.lit(2 ** 53) + 1)
        .cast("double") / F.lit(float(2 ** 53))
    )
    # node-edge pick probability of edge {u,v}: (1/n)(1/du) + (1/n)(1/dv)
    # — sums to exactly 1 over all edges, so the mixture weights really are
    # rne_ratio : (1 - rne_ratio) (a /2n here would halve the degree-biased
    # component and shift removal RANKS, not just rescale)
    rate = (
        F.lit((1.0 - rne_ratio) / m)
        + F.lit(rne_ratio / float(n)) * (1.0 / F.col("du") + 1.0 / F.col("dv"))
    )
    timed = (
        graph.edges.select("src", "dst")
        .join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dv"), "dst")
        .select("src", "dst", (-F.log(u01) / rate).alias("t"))
    )
    ranked = zip_with_rank(timed, [F.asc("t"), F.asc("src"), F.asc("dst")])
    return ranked.select(
        "src", "dst", ((F.col("rank") - 1) / F.lit(float(m))).alias("score")
    )


def modularity_edge_score(graph: Graph) -> DataFrame:
    """ModularityScoring (reference cpp/scoring/ModularityScoring.h:90-99):
    per-edge modularity gain of merging the endpoints' (singleton) clusters:

        score = w(u,v) / W  -  (wdeg(u) / 2W) * (wdeg(v) / 2W)

    with W the total edge weight. Two degree joins (broadcastable: the degree
    table is O(n) and narrow) + whole-stage-codegen arithmetic; no shuffle
    beyond the degree aggregation itself.
    """
    W = graph.total_edge_weight()
    wd = graph.weighted_degrees()
    return (
        graph.edges.join(
            wd.withColumnRenamed("node", "src").withColumnRenamed("wdeg", "wu"), "src"
        )
        .join(wd.withColumnRenamed("node", "dst").withColumnRenamed("wdeg", "wv"), "dst")
        .select(
            "src", "dst",
            (
                F.col("weight") / F.lit(W)
                - (F.col("wu") / F.lit(2.0 * W)) * (F.col("wv") / F.lit(2.0 * W))
            ).alias("score"),
        )
    )


def linearize_score(scores: DataFrame, inverse: bool = False) -> DataFrame:
    """EdgeScoreLinearizer (reference
    cpp/edgescores/EdgeScoreLinearizer.cpp:21-57): replace each edge score by
    its normalized rank position pos / (m - 1) in ascending (descending when
    ``inverse``) score order; a single edge gets 0.5. The reference breaks
    ties randomly; here ties break deterministically by (src, dst) — required
    for exact-match testing. Ranking is the distributed range-partition rank
    (plans/order.py), never a single-task global window.
    """
    from ..plans.order import zip_with_rank

    m = scores.count()
    if m == 1:
        return scores.select("src", "dst", F.lit(0.5).alias("score"))
    order = [
        F.desc("score") if inverse else F.asc("score"),
        F.asc("src"),
        F.asc("dst"),
    ]
    ranked = zip_with_rank(scores, order)
    return ranked.select(
        "src", "dst", ((F.col("rank") - 1) / F.lit(float(m - 1))).alias("score")
    )
