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
    low→high so wedges form at the low-degree endpoint).

    Undirected graphs only, like the reference (LocalClusteringCoefficient
    .cpp:7-8 throws on directed input): for a directed Graph ``sym()``
    returns only the stored arcs, so the (degree,id) orientation filter
    would silently drop 'downhill' arcs and report zero/wrong triangle
    counts — call ``graph.to_undirected()`` first if that is the intent."""
    if graph.directed:
        raise ValueError(
            "triangle counting requires an undirected graph "
            "(reference parity: LocalClusteringCoefficient.cpp:7-8); "
            "use graph.to_undirected() first"
        )
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


def triangles(
    graph: Graph, method: str = "adjacency", cache_handle: "list | None" = None
) -> DataFrame:
    """All triangles as (a, b, c) rows, each exactly once, a = apex (lowest
    (deg,id) vertex), and (b, c) ordered by id.

    ``method="wedge"`` (relational close): the wedge pair is ordered by the
    SAME (deg,id) key used for the orientation, so the closing edge b→c is
    itself an oriented edge — the close is a semi-join against the oriented
    set, and the undirected edge-set build (a second sym() scan + a distinct
    shuffle over 2m rows) drops out of the plan entirely. The oriented set
    is persisted: it feeds both sides of the wedge join and the close.

    ``method="adjacency"`` (the default; array intersection — the literal
    relational dual of the reference's marker-array intersection,
    TriangleEdgeScore.cpp:47-78): build the oriented out-adjacency ARRAYS
    (bounded per node by O(arboricity) thanks to the degree orientation),
    attach them to both endpoints of each oriented edge (two O(m)-row
    joins), and close wedges JVM-side with ``array_intersect`` + explode —
    the W-row wedge set is never materialized into a shuffle (the wedge
    method shuffles all W wedges for the closing semi-join; W >> m on
    power-law graphs).

    The oriented set stays persisted while the lazy result is alive; pass a
    list as ``cache_handle`` to receive it for unpersisting once consumed
    (the scalar wrappers below do)."""
    if method == "adjacency":
        o = _oriented_with_key(graph).select("src", "dst").persist()
        if cache_handle is not None:
            cache_handle.append(o)
        adj = o.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
        j = (
            o.join(
                adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nu")),
                o.src == F.col("u"),
            )
            .join(
                adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nv")),
                o.dst == F.col("v"),
            )
        )
        # common out-neighbor w of (u, v): triangle apex u (u < v < w in
        # orientation order, so apex = src matches the wedge method)
        tri = j.select(
            F.col("src").alias("a"),
            F.col("dst").alias("bb"),
            F.explode(F.array_intersect("nu", "nv")).alias("cc"),
        )
        return tri.select(
            "a", F.least("bb", "cc").alias("b"), F.greatest("bb", "cc").alias("c")
        )
    o = _oriented_with_key(graph).persist()
    if cache_handle is not None:
        cache_handle.append(o)
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
    cache: list = []
    try:
        return triangles(graph, cache_handle=cache).count()
    finally:
        for df in cache:
            df.unpersist()


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
    cpp/global/ClusteringCoefficient.cpp:110-131): the average of c(u) over
    nodes with degree >= 2 only — degree-0/1 nodes are excluded from the
    denominator, not counted as zeros (.cpp:120-124)."""
    deg = graph.degrees()
    row = (
        local_clustering_coefficient(graph)
        .join(deg, "node")
        .filter(F.col("degree") >= 2)
        .agg(F.avg("lcc").alias("c"))
        .collect()[0]
    )
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


def wedge_trials(
    graph: Graph, seed: int = 42, cache_handle: "list | None" = None
) -> DataFrame:
    """One deterministic Schank–Wagner wedge trial per node of degree >= 2:
    (node, degree, closed) where closed = 1 iff the sampled neighbor pair is
    adjacent (reference ClusteringCoefficient.cpp:133-165 approxAvgLocal trial
    body: pick two distinct random neighbors of v, test hasEdge(u, w)).

    Determinism/scale: instead of RNG draws, the two neighbor indices come
    from the portable md5-based hash60 of (node, seed) — i1 uniform on
    [0, deg), i2 uniform on the remaining deg-1 slots — over the node's
    neighbor list ranked by id. Every step is a per-node window or hash join
    (no global sort, no driver loop), and the same arithmetic is expressible
    in ANSI SQL for the DuckDB oracle. Trials use the simple neighbor sets
    (dedup'd, self-loops dropped), matching the reference's simple graphs.
    ``cache_handle`` receives the persisted adjacency for cleanup once the
    lazy result is consumed (the scalar estimators below use it)."""
    if graph.directed:
        raise ValueError(
            "wedge sampling requires an undirected graph — "
            "use graph.to_undirected() first"
        )
    from ..functions.dedup import hash60
    from pyspark.sql.window import Window

    nbrs = (
        graph.sym()
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    w = Window.partitionBy("src").orderBy("dst")
    ranked = nbrs.select(
        F.col("src").alias("node"),
        F.col("dst").alias("nbr"),
        (F.row_number().over(w) - 1).alias("r"),
    ).persist()
    if cache_handle is not None:
        cache_handle.append(ranked)
    deg = ranked.groupBy("node").agg(F.count("*").alias("degree"))
    h1 = hash60(F.concat_ws(":", F.col("node").cast("string"), F.lit(str(seed)), F.lit("a")))
    h2 = hash60(F.concat_ws(":", F.col("node").cast("string"), F.lit(str(seed)), F.lit("b")))
    picks = (
        deg.filter(F.col("degree") >= 2)
        .withColumn("i1", h1 % F.col("degree"))
        .withColumn("j", h2 % (F.col("degree") - 1))
        .withColumn("i2", F.col("j") + F.when(F.col("j") >= F.col("i1"), 1).otherwise(0))
    )
    r1 = ranked.select("node", F.col("nbr").alias("n1"), F.col("r").alias("i1"))
    r2 = ranked.select("node", F.col("nbr").alias("n2"), F.col("r").alias("i2"))
    pairs = picks.join(r1, ["node", "i1"]).join(r2, ["node", "i2"])
    und = nbrs.filter(F.col("src") < F.col("dst"))
    closed = pairs.join(
        und,
        (und.src == F.least(pairs.n1, pairs.n2)) & (und.dst == F.greatest(pairs.n1, pairs.n2)),
        "left_semi",
    ).select("node", "degree", F.lit(1).alias("closed"))
    return (
        picks.select("node", "degree")
        .join(closed.select("node", "closed"), "node", "left")
        .select("node", "degree", F.coalesce("closed", F.lit(0)).alias("closed"))
    )


def approx_avg_local_clustering(graph: Graph, seed: int = 42) -> float:
    """approxAvgLocal (reference ClusteringCoefficient.cpp:133-165): estimate
    of the degree>=2-restricted average local clustering coefficient from one
    wedge trial per node. Deviation from the reference noted: the reference
    draws `trials` i.i.d. nodes; this runs exactly one deterministic trial at
    EVERY eligible node (a stratified estimator with the same expectation and
    lower variance), so the estimate is reproducible across partitionings."""
    cache: list = []
    try:
        row = (
            wedge_trials(graph, seed, cache_handle=cache)
            .agg(F.avg("closed").alias("c"))
            .collect()[0]
        )
    finally:
        for df in cache:
            df.unpersist()
    return float(row["c"] or 0.0)


def approx_global_clustering(graph: Graph, seed: int = 42) -> float:
    """approxGlobal (reference ClusteringCoefficient.cpp:221-281): the
    reference samples nodes with probability proportional to deg·(deg-1)
    (prefix-sum + binary search, .cpp:225-232) and runs one wedge trial per
    draw. Stratified dual: one deterministic trial per node, votes weighted
    by deg·(deg-1) — identical expectation (exactGlobal), no driver-side
    prefix sum."""
    cache: list = []
    try:
        row = (
            wedge_trials(graph, seed, cache_handle=cache)
            .agg(
                (
                    F.sum(F.col("closed") * F.col("degree") * (F.col("degree") - 1))
                    / F.sum(F.col("degree") * (F.col("degree") - 1))
                ).alias("c")
            )
            .collect()[0]
        )
    finally:
        for df in cache:
            df.unpersist()
    return float(row["c"] or 0.0)


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


def clustering(graph: Graph, error: float = 0.01, seed: int = 42) -> float:
    """``networkit/globals.py:7-21 clustering(G, error)``: the adaptive
    average-local-clustering entry point — exact ``avgLocal`` below 100
    nodes, the Schank–Wagner approximation above. The reference maps
    ``error`` to ``ceil(ln(10)/error²)`` i.i.d. wedge samples (90%
    confidence); the distributed estimator here is the stratified
    one-trial-per-eligible-node variant (see approx_avg_local_clustering),
    whose n-proportional sample budget already exceeds that bound at every
    graph size where the approximate branch is taken with the default
    error=0.01 (ln(10)/0.01² ≈ 23k trials) only when n ≥ 23k; for smaller
    graphs it is simply a lower-variance estimate of the same expectation.
    ``error`` therefore only selects the branch, matching the reference's
    observable behavior, not its RNG."""
    if graph.num_nodes() < 100:
        return average_local_clustering_coefficient(graph)
    return approx_avg_local_clustering(graph, seed=seed)


def k_truss(
    graph: Graph,
    k: int,
    max_rounds: int = 200,
    stats: dict | None = None,
    recompute_frac: float = 0.03,
) -> DataFrame:
    """Edges of the k-truss: the maximal subgraph in which every edge closes
    at least ``k - 2`` triangles (Cohen 2008, *Trusses: cohesive subgraphs
    for social network analysis*; distributed support-decrement peel as in
    Wang & Cheng, VLDB 2012). Returns the surviving canonical undirected
    edges ``(src, dst)`` with ``src < dst``; k ≥ 3. No reference C++ twin —
    a Spark-first cohesive-subgraph extension over the same degree-ordered
    triangle kernel as :func:`triangles`.

    Peel loop (support maintenance — NOT per-round recomputation): per-edge
    support is computed ONCE from a full triangle enumeration; each round
    then (1) takes the frontier (edges with support < k-2), (2) enumerates
    only the DISTINCT triangles touching the frontier inside the
    round-start graph (frontier ⋈ adjacency with the frontier broadcast
    when small, so the big edge side never reshuffles), and (3) decrements
    each dead triangle's SURVIVING edges by exactly one — a triangle with
    two or three frontier edges still dies once, hence the distinct on the
    sorted triple. Round cost is therefore proportional to the deletion
    frontier's triangle neighborhood, not the graph: on deep peel cascades
    (length L) this does O(total destroyed triangles) work overall where a
    recompute loop pays L full arboricity-bounded passes.

    HYBRID recompute: when a round's frontier exceeds
    ``recompute_frac`` of the surviving edges (the k-truss of a skewed web
    graph typically sheds ~30% of all edges in round 1), probing the
    frontier's triangle neighborhood costs MORE than one full
    arboricity-bounded triangle pass over the survivors — the hub
    adjacency blow-up of a million-edge frontier dwarfs a clean
    degree-ordered pass — so the round recomputes supports from scratch on
    the survivor subgraph instead (measured at sf1/RMAT: 183 s pure
    decrement vs ~2 full passes + small-frontier rounds with the hybrid).

    Support maintenance is exact: support within the surviving subgraph
    equals initial support minus triangles destroyed, so the surviving edge
    set per round is identical to the recompute formulation regardless of
    which path a round takes (the pytest replica sweep pins this). Raises RuntimeError if ``max_rounds`` is
    exhausted before the fixpoint — a silent non-fixpoint return would be
    indistinguishable from a converged truss."""
    from ..plans.ckpt import clean_local_checkpoint as _cc

    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    cur = _cc(
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )
    if cur.isEmpty():
        return cur
    def _full_support(edge_df):
        # full arboricity-bounded triangle pass -> (src, dst, support)
        g0 = Graph(
            edge_df.select("src", "dst", F.lit(1.0).alias("weight")),
            directed=False,
            weighted=False,
        )
        handle: list = []
        tri = triangles(g0, cache_handle=handle)
        corners = (
            tri.select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
            .unionByName(
                tri.select(F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst"))
            )
            .unionByName(
                tri.select(F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst"))
            )
        )
        sup0 = corners.groupBy("src", "dst").agg(F.count("*").alias("support"))
        out = _cc(
            edge_df.join(sup0, ["src", "dst"], "left").select(
                "src", "dst", F.coalesce("support", F.lit(0)).alias("support")
            )
        )
        for h in handle:
            h.unpersist()
        return out

    state = _full_support(cur)
    n_cur = state.count()
    # broadcast the frontier below this row count so the O(m) side of the
    # frontier-triangle probe never reshuffles (2 longs/row → ~16 MB at 1M)
    bcast_limit = 1_000_000
    for _ in range(max_rounds):
        frontier = state.filter(F.col("support") < k - 2).select("src", "dst")
        frontier = _cc(frontier)
        n_del = frontier.count()
        if stats is not None:
            stats.setdefault("frontiers", []).append(n_del)
            stats["rounds"] = stats.get("rounds", 0) + 1
        if n_del == 0:
            return state.select("src", "dst")
        if n_del > recompute_frac * max(1, n_cur):
            # massive frontier: one clean full pass over the survivors beats
            # probing the frontier's (hub-amplified) triangle neighborhood
            survivors = state.join(frontier, ["src", "dst"], "left_anti").select(
                "src", "dst"
            )
            state = _full_support(survivors)
            n_cur = n_cur - n_del
            if stats is not None:
                stats.setdefault("recompute_rounds", 0)
                stats["recompute_rounds"] += 1
            continue
        n_cur = n_cur - n_del
        fr = F.broadcast(frontier) if n_del <= bcast_limit else frontier
        # both orientations of the round-start edge set, for adjacency probes
        sym = state.select("src", "dst").unionByName(
            state.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # distinct triangles touching the frontier: for frontier edge (u,v),
        # w adjacent to u via sym, then (v,w) membership via a second probe
        cand = (
            fr.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .join(
                sym.select(F.col("src").alias("u"), F.col("dst").alias("w")), "u"
            )
            .filter((F.col("w") != F.col("v")))
        )
        # cand is frontier × adjacency — hub-amplified and unbounded
        # relative to n_del, so never hint-broadcast it (an explicit hint
        # bypasses autoBroadcastJoinThreshold and a hub-heavy frontier could
        # force tens of millions of rows onto the driver). AQE's runtime
        # size stats promote the join to broadcast when cand is actually
        # small, which is the measured-size gate we want.
        tri_dead = (
            cand.join(
                sym.select(F.col("src").alias("v"), F.col("dst").alias("w")),
                ["v", "w"],
                "left_semi",
            )
            .select(F.array_sort(F.array("u", "v", "w")).alias("t"))
            .distinct()
        )
        # each dead triangle decrements each of its SURVIVING edges once
        dead_edges = tri_dead.select(
            F.explode(
                F.array(
                    F.struct(F.col("t")[0].alias("src"), F.col("t")[1].alias("dst")),
                    F.struct(F.col("t")[0].alias("src"), F.col("t")[2].alias("dst")),
                    F.struct(F.col("t")[1].alias("src"), F.col("t")[2].alias("dst")),
                )
            ).alias("e")
        ).select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        dec = _cc(
            dead_edges.join(fr, ["src", "dst"], "left_anti")
            .groupBy("src", "dst")
            .agg(F.count("*").alias("dec"))
        )
        n_dec = dec.count()
        dec_b = F.broadcast(dec) if n_dec <= bcast_limit else dec
        # both frontier and dec are frontier-neighborhood-sized: broadcast
        # them so the O(m) state never reshuffles in the update
        state = _cc(
            state.join(fr, ["src", "dst"], "left_anti")
            .join(dec_b, ["src", "dst"], "left")
            .select(
                "src",
                "dst",
                (F.col("support") - F.coalesce("dec", F.lit(0))).alias("support"),
            )
        )
    raise RuntimeError(
        f"k_truss did not reach a fixpoint within max_rounds={max_rounds}; "
        "the peel cascade is deeper than the round budget — raise max_rounds"
    )
