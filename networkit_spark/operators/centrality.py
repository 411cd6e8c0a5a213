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
from ..plans.ckpt import clean_local_checkpoint as _cc
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
    # nodes unreached by EVERY sampled pivot (small far components, isolated
    # nodes) still get a row — score 0, like the exact siblings that all
    # coalesce over graph.nodes()
    return graph.nodes().join(sums, "node", "left").select(
        "node",
        F.when(
            F.coalesce("total", F.lit(0.0)) > 0,
            F.col("reached") / F.col("total"),
        )
        .otherwise(0.0)
        .alias("score"),
    )


def harmonic_closeness_sampled(graph: Graph, sources: list[int]) -> DataFrame:
    """Harmonic closeness from a source sample: ``score(v) = Σ_s 1/d(s, v)``
    over reached pairs with d > 0 (Marchiori & Latora's harmonic variant —
    robust to disconnected graphs, where classic closeness degenerates;
    Spark-first sibling of :func:`closeness_sampled` sharing the one batched
    multi-source BFS). Unreached nodes score 0."""
    pairs = multi_source_bfs(graph, sources)
    sums = (
        pairs.filter(F.col("dist") > 0)
        .groupBy("node")
        .agg(F.sum(1.0 / F.col("dist").cast("double")).alias("s"))
    )
    return graph.nodes().join(sums, "node", "left").select(
        "node", F.coalesce("s", F.lit(0.0)).alias("score")
    )


def brandes_dependencies(
    graph: Graph, sources: list[int], edge_acc: "list | None" = None
) -> DataFrame:
    """Per-source Brandes dependencies ``(source, node, delta)`` — the
    pre-aggregation state of :func:`betweenness_sampled`, exposed so
    incremental callers (streaming/dynamic.py DynApproxBetweenness) can
    recompute only affected sources and keep the rest.

    Batched multi-source: sigma/delta state carries a ``source`` column, so
    each forward/backward level superstep processes EVERY sampled source at
    once — total supersteps = 2·max-eccentricity, independent of the number
    of samples."""
    sym = graph.sym_part().persist()
    sym.count()
    # Backward lookup "in-neighbors of w": for undirected graphs the sym set
    # is symmetric, so (src ∈ N(w)) rows equal (src=w, dst ∈ N(w)) rows and
    # the dst-keyed lookup can reuse the src-partitioned cache (the state
    # side renames node→src); directed graphs need the true dst key.
    rsym = (
        sym.select(F.col("src").alias("dst"), F.col("dst").alias("src"))
        if not graph.directed
        else graph.sym_part(key="dst").persist()
    )
    dist = multi_source_bfs(graph, sources).persist()
    max_d = dist.agg(F.max("dist")).collect()[0][0] or 0
    # forward sweep: sigma(source, v) = # shortest s→v paths
    sigma = (
        dist.filter(F.col("dist") == 0)
        .select("source", "node", F.lit(1.0).alias("sigma"))
        .transform(_cc)
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
        sigma = sigma.unionByName(nxt).transform(_cc)
    # backward dependency accumulation, all sources per level superstep
    state = (
        dist.join(sigma, ["source", "node"])
        .select("source", "node", "dist", "sigma", F.lit(0.0).alias("delta"))
        .transform(_cc)
    )
    edge_contribs: list[DataFrame] = []
    for lvl in range(max_d, 0, -1):
        w = state.filter(F.col("dist") == lvl).select(
            "source", F.col("node").alias("dst"),
            F.col("sigma").alias("sw"), F.col("delta").alias("dw"),
        )
        pair_c = (
            rsym.join(w, "dst")
            .select("source", F.col("src").alias("node"), "dst", "sw", "dw")
            .join(
                state.filter(F.col("dist") == lvl - 1).select(
                    "source", "node", F.col("sigma").alias("sv")
                ),
                ["source", "node"],
            )
            .select(
                "source", "node", "dst",
                (F.col("sv") / F.col("sw") * (1.0 + F.col("dw"))).alias("c"),
            )
        )
        if edge_acc is not None:
            # per-DAG-edge dependency (v, w, c) — the Girvan-Newman edge
            # betweenness terms; checkpoint ONLY this level's terms (O(total)
            # work overall), union the per-level frames once after the loop —
            # re-materializing the accumulated union every round would be
            # O(depth × total terms)
            lvl_edges = pair_c.select(
                "source", F.col("node").alias("src"), "dst", "c"
            ).transform(_cc)
            edge_contribs.append(lvl_edges)
        contrib = (
            pair_c
            .groupBy("source", "node")
            .agg(F.sum("c").alias("c"))
        )
        state = (
            state.join(contrib, ["source", "node"], "left")
            .select(
                "source", "node", "dist", "sigma",
                (F.col("delta") + F.coalesce("c", F.lit(0.0))).alias("delta"),
            )
            .transform(_cc)
        )
    deps = state.filter(F.col("node") != F.col("source")).select(
        "source", "node", "delta"
    ).transform(_cc)
    if edge_acc is not None:
        spark = graph.edges.sparkSession
        if edge_contribs:
            acc_df = edge_contribs[0]
            for part in edge_contribs[1:]:
                acc_df = acc_df.unionByName(part)
        else:
            acc_df = spark.createDataFrame(
                [], "source long, src long, dst long, c double"
            )
        edge_acc.append(acc_df)
    dist.unpersist()
    sym.unpersist()
    if graph.directed:
        rsym.unpersist()
    return deps


def betweenness_sampled(graph: Graph, sources: list[int]) -> DataFrame:
    """Sampled Brandes (ApproxBetweenness2.cpp shape): BFS shortest-path DAG
    + dependency accumulation as DataFrame supersteps over distance levels
    (see :func:`brandes_dependencies`). Returns (node, score)."""
    deps = brandes_dependencies(graph, sources)
    out = deps.groupBy("node").agg(F.sum("delta").alias("score"))
    return graph.nodes().join(out, "node", "left").select(
        "node", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def edge_betweenness_sampled(graph: Graph, sources: list[int]) -> DataFrame:
    """Sampled EDGE betweenness (the Girvan-Newman primitive): per edge the
    summed shortest-path dependency ``σ_v/σ_w·(1+δ_w)`` over the sampled
    sources' BFS DAGs — the per-edge terms the Brandes backward sweep
    already forms before its node aggregation (:func:`brandes_dependencies`
    ``edge_acc``). Returns every canonical edge ``(src, dst, score)``;
    edges on no sampled shortest path score 0. Undirected graphs fold both
    DAG orientations onto the (min, max) edge key."""
    acc: list = []
    brandes_dependencies(graph, sources, edge_acc=acc)
    terms = acc[0]
    if not graph.directed:
        terms = terms.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "c",
        )
    scores = terms.groupBy("src", "dst").agg(F.sum("c").alias("score"))
    base = graph.edges.select("src", "dst").distinct()
    if not graph.directed:
        base = base.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).distinct()
    return base.join(scores, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def approx_betweenness(
    graph: Graph, num_samples: int = 64, seed: int = 42, normalized: bool = True
) -> DataFrame:
    """ApproxBetweenness2 (reference cpp/centrality/ApproxBetweenness2.cpp:
    16-52): Brandes dependencies from a random source sample, normalized by
    the sample count. Sources are a seeded hash-sample of the node set (the
    reference uses GraphTools::randomNodes; the hash order is the
    reproducible analog). Delegates to the batched multi-source
    :func:`betweenness_sampled`."""
    srcs = [
        r["node"]
        for r in graph.nodes()
        .orderBy(F.abs(F.xxhash64("node", F.lit(seed))), F.asc("node"))
        .limit(num_samples)
        .collect()
    ]
    out = betweenness_sampled(graph, srcs)
    if normalized and srcs:
        out = out.select("node", (F.col("score") / F.lit(float(len(srcs)))).alias("score"))
    return out


def approx_closeness(
    graph: Graph, num_samples: int = 64, seed: int = 42
) -> DataFrame:
    """ApproxCloseness (reference cpp/centrality/ApproxCloseness.cpp shape):
    closeness estimated from a random pivot sample's BFS distances.
    Seeded-hash pivot selection + the batched multi-source
    :func:`closeness_sampled`."""
    srcs = [
        r["node"]
        for r in graph.nodes()
        .orderBy(F.abs(F.xxhash64("node", F.lit(seed))), F.asc("node"))
        .limit(num_samples)
        .collect()
    ]
    return closeness_sampled(graph, srcs)


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


def top_closeness(graph: Graph, k: int = 10, batch: int | None = None) -> DataFrame:
    """Exact top-k closeness with upper-bound pruning
    (cpp/centrality/TopCloseness.cpp — the NBcut/NBbound scheme reduced to
    its distributed essence): candidates are examined in decreasing order of
    a degree-based closeness upper bound and BFS'd in BATCHES through the
    batched multi-source frontier; the loop stops when the k-th best exact
    score beats every remaining node's bound, which certifies exactness
    without touching the rest of the graph.

    Closeness here is the per-component form c(v) = (r_v - 1) / farness(v)
    with r_v = v's component size; the bound is farness(v) >=
    deg(v) + 2 (r_v - 1 - deg(v)) (neighbors at distance 1, everything else
    at >= 2). Returns (rank, node, score), rank 1 = highest.
    """
    from .components import connected_components

    if batch is None:
        batch = max(2 * k, 16)
    comp = connected_components(graph)
    csize = comp.groupBy("component").agg(F.count("*").alias("r"))
    deg = graph.degrees()
    bound = (
        comp.join(csize, "component")
        .join(deg, "node", "left")
        .select(
            "node", "r",
            F.coalesce("degree", F.lit(0)).alias("deg"),
        )
        .withColumn(
            "ub",
            F.when(
                F.col("r") > 1,
                (F.col("r") - 1)
                / (2.0 * (F.col("r") - 1) - F.least(F.col("deg"), F.col("r") - 1)),
            ).otherwise(F.lit(0.0)),
        )
        .select("node", "ub")
        .persist()
    )
    exact_rows: list = []
    remaining = bound
    while True:
        cand = [
            (r["node"], r["ub"])
            for r in remaining.orderBy(F.desc("ub"), F.asc("node")).limit(batch).collect()
        ]
        if not cand:
            break
        sources = [c[0] for c in cand]
        d = multi_source_bfs(graph, sources)
        ex = (
            d.groupBy("source")
            .agg(F.sum("dist").alias("far"), F.count("*").alias("r"))
            .select(
                F.col("source").alias("node"),
                F.when(F.col("far") > 0, (F.col("r") - 1) / F.col("far"))
                .otherwise(0.0)
                .alias("score"),
            )
            .collect()
        )
        exact_rows.extend((r["node"], float(r["score"])) for r in ex)
        prev_remaining = remaining
        remaining = prev_remaining.join(
            graph.edges.sparkSession.createDataFrame(
                [(s,) for s in sources], "node long"
            ),
            "node",
            "left_anti",
        ).persist()
        remaining.count()  # materialize before releasing the parent cache
        if prev_remaining is not bound:
            prev_remaining.unpersist()
        if len(exact_rows) >= k:
            kth = sorted((s for _, s in exact_rows), reverse=True)[k - 1]
            mx = remaining.agg(F.max("ub")).collect()[0][0]
            if mx is None or mx <= kth:
                break
    if remaining is not bound:
        remaining.unpersist()
    bound.unpersist()
    top = sorted(exact_rows, key=lambda t: (-t[1], t[0]))[:k]
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(i + 1, n, s) for i, (n, s) in enumerate(top)],
        "rank int, node long, score double",
    )


def kpath_centrality(
    graph: Graph, k: int = 8, walks_per_node: int = 4, seed: int = 42
) -> DataFrame:
    """K-path centrality (cpp/centrality/KPathCentrality.cpp): randomized —
    count how often each node sits on random simple paths of length <= k.
    The reference runs sequential random walks; the distributed analog runs
    ALL walks as one (walk, position) frontier: each step joins the frontier
    to the adjacency, picks each walk's next hop as the min-hash neighbor
    (uniform over neighbors, deterministic in seed), and drops revisits via
    the carried path array (k is small). Score = visit count / #walks,
    node 0 of each walk excluded like the reference."""
    spark = graph.edges.sparkSession
    n = graph.num_nodes()
    walks = (
        graph.nodes()
        .select(
            F.col("node").alias("start"),
            F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
        )
        .select(
            F.concat_ws("#", F.col("start").cast("string"), F.col("w").cast("string")).alias("walk"),
            F.col("start").alias("cur"),
            F.array(F.col("start")).alias("path"),
        )
        .transform(_cc)
    )
    sym = graph.sym_part().persist()
    visits = None
    frontier = walks
    for step in range(1, k + 1):
        nxt = (
            sym.join(frontier, sym.src == frontier.cur)
            .filter(~F.array_contains(F.col("path"), F.col("dst")))
            .groupBy("walk")
            .agg(
                F.min_by(
                    F.struct(F.col("dst").alias("cur"), F.col("path")),
                    F.xxhash64("walk", "dst", F.lit(seed), F.lit(step)),
                ).alias("pick")
            )
            .select(
                "walk",
                F.col("pick.cur").alias("cur"),
                F.array_append(F.col("pick.path"), F.col("pick.cur")).alias("path"),
            )
            .transform(_cc)
        )
        v = nxt.select(F.col("cur").alias("node"))
        visits = v if visits is None else visits.unionByName(v)
        frontier = nxt
        if frontier.isEmpty():
            break
    sym.unpersist()
    total_walks = float(n * walks_per_node)
    counts = (
        visits.groupBy("node").agg((F.count("*") / F.lit(total_walks)).alias("score"))
        if visits is not None
        else spark.createDataFrame([], "node long, score double")
    )
    return graph.nodes().join(counts, "node", "left").select(
        "node", F.coalesce("score", F.lit(0.0)).alias("score")
    )
