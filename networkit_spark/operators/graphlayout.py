"""Graph layout — PivotMDS (reference cpp/viz/PivotMDS.cpp:23-143).

Pipeline: k pivots → shortest-path distances from every pivot (ONE batched
multi-source relax, (pivot, node) keyed — |pivots| SSSPs for one SSSP's
worth of supersteps) → double-center the n×k distance matrix (two aggregate
joins + a scalar) → C^T C (k×k, one aggregate; k is tiny so it collects to
the driver like the reference's CSRMatrix) → power-iterate the top ``dim``
eigenvectors with deflation (driver, numpy, k×k — the reference's
powerMethod verbatim) → project positions pos_d = C · v_d (distributed
join + aggregate).

Determinism deviations (documented): pivots are the ``num_pivots`` nodes
with smallest seeded hash (reference: randomNode draws); the power-method
start vector is seeded (reference: Aux::Random). Everything downstream is
the reference computation.

The only driver-side object is k×k — at web scale the n-row matrices stay
DataFrames throughout.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.dedup import hash60
from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc

_HSPACE = float(2 ** 60)


def _pivots(graph: Graph, k: int, seed: int) -> list[int]:
    h = hash60(F.concat_ws(":", F.col("node").cast("string"), F.lit(str(seed))))
    rows = (
        graph.nodes().select("node", h.alias("h")).orderBy("h", "node").limit(k).collect()
    )
    return [int(r["node"]) for r in rows]


def _pivot_distances(graph: Graph, pivots: list[int], max_iter: int = 10_000) -> DataFrame:
    """(pivot, node, dist): batched multi-source weighted relaxation
    (Dijkstra semantics via Bellman-Ford supersteps, like
    distance.sssp_distances but keyed by pivot)."""
    spark = graph.edges.sparkSession
    sym = graph.sym().persist()
    sym.count()
    dist = spark.createDataFrame(
        [(p, p, 0.0) for p in pivots], "pivot long, node long, dist double"
    ).transform(_cc)
    changed = dist
    while max_iter > 0 and not changed.isEmpty():
        max_iter -= 1
        relax = (
            sym.join(changed, sym.src == changed.node)
            .select(
                "pivot",
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("weight")).alias("dist"),
            )
            .groupBy("pivot", "node")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.unionByName(relax)
            .groupBy("pivot", "node")
            .agg(F.min("dist").alias("dist"))
        ).transform(_cc)
        changed = (
            merged.alias("a")
            .join(dist.alias("b"), ["pivot", "node"], "left")
            .filter(F.col("b.dist").isNull() | (F.col("a.dist") < F.col("b.dist")))
            .select("pivot", "node", F.col("a.dist").alias("dist"))
            .transform(_cc)
        )
        dist = merged
    sym.unpersist()
    return dist


def pivot_mds(
    graph: Graph, dim: int = 2, num_pivots: int = 16, seed: int = 42
) -> DataFrame:
    """(node, x0, .., x{dim-1}) coordinates. PivotMDS.cpp:23-105 faithfully:
    raw (not squared) pivot distances double-centered, top eigenvectors of
    C^T C by power iteration with deflation, positions = C v."""
    spark = graph.edges.sparkSession
    n = graph.num_nodes()
    pivots = _pivots(graph, num_pivots, seed)
    k = len(pivots)
    pidx = {p: j for j, p in enumerate(pivots)}
    pmap = spark.createDataFrame(
        sorted(pidx.items()), "pivot long, j int"
    )

    d = _pivot_distances(graph, pivots).join(F.broadcast(pmap), "pivot").select(
        "node", "j", "dist"
    )
    # double centering (PivotMDS.cpp:47-69): value -= rowMean + colMean - grand
    row_mean = d.groupBy("node").agg((F.sum("dist") / k).alias("rm"))
    col_mean = d.groupBy("j").agg((F.sum("dist") / n).alias("cm"))
    rm_sum = row_mean.agg(F.sum("rm")).collect()[0][0] or 0.0
    cm_rows = {r["j"]: r["cm"] for r in col_mean.collect()}
    grand = rm_sum / (2.0 * n) + sum(cm_rows.values()) / (2.0 * k)
    centered = (
        d.join(row_mean, "node")
        .join(F.broadcast(col_mean), "j")
        .select(
            "node", "j",
            (F.col("dist") - F.col("rm") - F.col("cm") + F.lit(grand)).alias("v"),
        )
        .persist()
    )
    centered.count()

    # C^T C (k x k) — one aggregate over node-matched pairs, collected
    a = centered.select("node", F.col("j").alias("ja"), F.col("v").alias("va"))
    b = centered.select("node", F.col("j").alias("jb"), F.col("v").alias("vb"))
    cc_rows = (
        a.join(b, "node")
        .groupBy("ja", "jb")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("s"))
        .collect()
    )
    CC = np.zeros((k, k))
    for r in cc_rows:
        CC[r["ja"], r["jb"]] = r["s"]

    # power method + deflation (PivotMDS.cpp:77-105,124-143), seeded start
    rng = np.random.RandomState(seed)
    out = graph.nodes()
    for dcoord in range(dim):
        v = 2.0 * rng.rand(k) - 1.0
        for _ in range(1500):
            old = v
            v = CC @ old
            v = v / np.linalg.norm(v)
            if np.linalg.norm(v - old) <= 1e-6:
                break
        lam = float(v @ (CC @ v)) / float(v @ v)
        # pos = C v, distributed
        ev = spark.createDataFrame(
            [(j, float(v[j])) for j in range(k)], "j int, ev double"
        )
        pos = (
            centered.join(F.broadcast(ev), "j")
            .groupBy("node")
            .agg(F.sum(F.col("v") * F.col("ev")).alias(f"x{dcoord}"))
        )
        out = out.join(pos, "node", "left").withColumn(
            f"x{dcoord}", F.coalesce(f"x{dcoord}", F.lit(0.0))
        )
        CC = CC - (lam / float(v @ v)) * np.outer(v, v)
    centered.unpersist()
    return out


def fruchterman_reingold(
    graph: Graph,
    max_iter: int = 50,
    precision: float = 1e-3,
    grid: int | None = None,
    seed: int = 42,
    init: DataFrame | None = None,
) -> DataFrame:
    """Force-directed layout in the unit square — reference
    cpp/viz/FruchtermanReingold.cpp:23-160: repulsion opt²/d² between node
    pairs, attraction d/opt along edges, normalized step moves with the
    1/(1 + 0.1·iter) cooling schedule, clamp to [0,1]², converge when the
    summed move distance drops below ``precision``.

    Scale shape: the reference's repulsion is exact all-pairs O(n²). Here
    pairs are generated per GRID CELL (cell + 8 neighbors, the standard
    spatial-hash cutoff): ``grid=1`` reproduces the exact reference sum
    (one cell holds everything — tests pin this against a NumPy replica);
    ``grid=None`` auto-sizes ~sqrt(n)/8 cells per axis so cell occupancy
    stays O(1) and each iteration is a keyed self-join, not a cross join.
    Init coordinates are seeded-hash uniforms (reference: global RNG);
    ``init`` (node, x, y) seeds them instead — the reference's
    ``useGivenLayout=true`` mode (Layouter.h), used by the multilevel
    prolongation.

    Returns (node, x, y).
    """
    spark = graph.edges.sparkSession
    n = graph.num_nodes()
    if grid is None:
        grid = max(1, int((n ** 0.5) / 8))
    opt2 = 0.3 * 1.0 / n  # OPT_PAIR_SQR_DIST_SCALE * area / n, unit square
    opt = opt2 ** 0.5

    def h01(tag):
        return hash60(
            F.concat_ws(":", F.col("node").cast("string"), F.lit(tag), F.lit(str(seed)))
        ) / F.lit(_HSPACE)

    if init is not None:
        pos = (
            graph.nodes()
            .join(init.select("node", "x", "y"), "node", "left")
            .select(
                "node",
                F.coalesce("x", h01("x")).alias("x"),
                F.coalesce("y", h01("y")).alias("y"),
            )
            .transform(_cc)
        )
    else:
        pos = graph.nodes().select(
            "node", h01("x").alias("x"), h01("y").alias("y")
        ).transform(_cc)
    sym = graph.sym().select("src", "dst").persist()
    sym.count()

    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    step = 1.0
    cool = 1.0
    for it in range(max_iter):
        cell = pos.select(
            "node", "x", "y",
            F.floor(F.col("x") * grid).cast("int").alias("cx"),
            F.floor(F.col("y") * grid).cast("int").alias("cy"),
        )
        # neighbors-of-cell expansion for the left side of the pair join
        left = cell.crossJoin(F.broadcast(offsets)).select(
            "node", "x", "y",
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
        right = cell.select(
            F.col("node").alias("node2"), F.col("x").alias("x2"),
            F.col("y").alias("y2"), "cx", "cy",
        )
        d2 = (F.col("x") - F.col("x2")) ** 2 + (F.col("y") - F.col("y2")) ** 2
        rep = (
            left.join(right, ["cx", "cy"])
            .filter(F.col("node") != F.col("node2"))
            .select(
                "node",
                F.when(d2 > 0, (F.col("x") - F.col("x2")) * F.lit(opt2) / d2)
                .otherwise(0.0).alias("fx"),
                F.when(d2 > 0, (F.col("y") - F.col("y2")) * F.lit(opt2) / d2)
                .otherwise(0.0).alias("fy"),
            )
            .groupBy("node").agg(F.sum("fx").alias("fx"), F.sum("fy").alias("fy"))
        )
        pu = pos.select(F.col("node").alias("src"), F.col("x").alias("x"), F.col("y").alias("y"))
        pv = pos.select(F.col("node").alias("dst"), F.col("x").alias("x2"), F.col("y").alias("y2"))
        dist = F.sqrt(d2)
        attr = (
            sym.join(pu, "src").join(pv, "dst")
            .select(
                F.col("src").alias("node"),
                (-(F.col("x") - F.col("x2")) * dist / F.lit(opt)).alias("fx"),
                (-(F.col("y") - F.col("y2")) * dist / F.lit(opt)).alias("fy"),
            )
        )
        forces = (
            rep.unionByName(attr)
            .groupBy("node").agg(F.sum("fx").alias("fx"), F.sum("fy").alias("fy"))
        )
        flen = F.sqrt(F.col("fx") ** 2 + F.col("fy") ** 2)
        moved = (
            pos.join(forces, "node", "left")
            .select(
                "node",
                F.col("x").alias("ox"), F.col("y").alias("oy"),
                F.when(
                    F.coalesce(flen, F.lit(0.0)) > 0,
                    F.col("x") + F.lit(cool) * F.col("fx") / flen,
                ).otherwise(F.col("x")).alias("x"),
                F.when(
                    F.coalesce(flen, F.lit(0.0)) > 0,
                    F.col("y") + F.lit(cool) * F.col("fy") / flen,
                ).otherwise(F.col("y")).alias("y"),
            )
            .select(
                "node", "ox", "oy",
                F.least(F.greatest(F.col("x"), F.lit(0.0)), F.lit(1.0)).alias("x"),
                F.least(F.greatest(F.col("y"), F.lit(0.0)), F.lit(1.0)).alias("y"),
            )
            .transform(_cc)
        )
        change = (
            moved.agg(
                F.sum(
                    F.sqrt((F.col("x") - F.col("ox")) ** 2 + (F.col("y") - F.col("oy")) ** 2)
                ).alias("c")
            ).collect()[0]["c"] or 0.0
        )
        pos = moved.select("node", "x", "y")
        step += 0.1
        cool = 1.0 / step
        if change < precision:
            break
    sym.unpersist()
    return pos


def multilevel_layout(
    graph: Graph,
    n_thresh: int = 64,
    max_iter: int = 50,
    seed: int = 42,
    refine: str = "fr",
    maxent_rounds: int = 5,
    _level: int = 0,
) -> DataFrame:
    """Multilevel force-directed layout — reference
    cpp/viz/MultilevelLayouter.cpp:34-79: below ``n_thresh`` nodes lay out
    directly with Fruchterman-Reingold; otherwise PLP-cluster, coarsen by
    the clustering (ParallelPartitionCoarsening), recursively lay out the
    coarse graph, prolong (every fine node takes its coarse cluster's
    coordinate, MultilevelLayouter.cpp:68-71), and FR-refine from the given
    layout. Returns (node, x, y) in the unit square.

    Each level's refinement runs over the FINE graph but starts pre-placed,
    so it needs few iterations — the standard multilevel speedup; all steps
    (PLP, coarsen, FR) are the existing distributed operators.

    ``refine="maxent"`` swaps the FINEST level's refinement for
    :func:`maxent_stress` seeded from the prolonged layout (the reference's
    MaxentStress also runs inside a coarsening hierarchy,
    MaxentStress.cpp) — better distance fidelity on mesh-like graphs at
    the cost of ``maxent_rounds`` Laplacian solves.
    """
    from .community import coarsen, plp

    n = graph.num_nodes()
    if n <= n_thresh or _level >= 20:
        return fruchterman_reingold(graph, max_iter=max_iter, seed=seed + _level)
    labels = plp(graph, fixed_iters=4).transform(_cc)
    cg = coarsen(graph, labels)
    if cg.num_nodes() >= n:  # clustering did not shrink the graph: stop
        return fruchterman_reingold(graph, max_iter=max_iter, seed=seed + _level)
    coarse_pos = multilevel_layout(
        cg, n_thresh=n_thresh, max_iter=max_iter, seed=seed, _level=_level + 1
    )
    init = (
        labels.join(
            coarse_pos.select(F.col("node").alias("label"), "x", "y"), "label"
        )
        .select("node", "x", "y")
    )
    if refine == "maxent" and _level == 0:
        out = maxent_stress(
            graph,
            rounds=maxent_rounds,
            seed=seed,
            init=init.select("node", F.col("x").alias("p0"), F.col("y").alias("p1")),
        )
        return out.select("node", "x", "y")
    return fruchterman_reingold(
        graph, max_iter=max(10, max_iter // 2), seed=seed + _level, init=init
    )


def _maxent_positions_init(graph: Graph, dim: int, seed: int) -> DataFrame:
    cols = [
        (
            hash60(
                F.concat_ws(
                    ":", F.col("node").cast("string"), F.lit(f"mx{k}"), F.lit(str(seed))
                )
            )
            / F.lit(_HSPACE)
        ).alias(f"p{k}")
        for k in range(dim)
    ]
    return graph.nodes().select("node", *cols)


def stress_value(graph: Graph, pos: DataFrame, dim: int = 2) -> float:
    """Weighted stress Σ_{(i,j)∈E} w_ij (||x_i - x_j|| - d_ij)² with
    w_ij = 1/d_ij² (the maxent-stress objective's stress half,
    MaxentStress.cpp fullStressMeasure analog)."""
    e = graph.sym().select("src", "dst", "weight").filter(F.col("src") < F.col("dst"))
    pu = pos.select(
        F.col("node").alias("src"), *[F.col(f"p{k}").alias(f"u{k}") for k in range(dim)]
    )
    pv = pos.select(
        F.col("node").alias("dst"), *[F.col(f"p{k}").alias(f"v{k}") for k in range(dim)]
    )
    d2 = None
    for k in range(dim):
        t = (F.col(f"u{k}") - F.col(f"v{k}")) ** 2
        d2 = t if d2 is None else d2 + t
    dist = F.sqrt(d2)
    row = (
        e.join(pu, "src")
        .join(pv, "dst")
        .agg(
            F.sum(
                (dist - F.col("weight")) ** 2 / (F.col("weight") ** 2)
            ).alias("s")
        )
        .first()
    )
    return float(row["s"] or 0.0)


def maxent_stress(
    graph: Graph,
    dim: int = 2,
    rounds: int = 10,
    alpha: float = 0.008,
    q: float = 0.0,
    cg_iters: int = 20,
    repulsion_samples: int = 4,
    exact_repulsion: bool = False,
    seed: int = 42,
    init: DataFrame | None = None,
) -> DataFrame:
    """Maxent-stress layout — reference cpp/viz/MaxentStress.cpp (Gansner,
    Hu & North 2012, *A maxent-stress model for graph layout*): minimize
    edge stress Σ w_ij(||x_i-x_j|| - d_ij)² plus an entropy term that
    repels non-adjacent pairs, by the paper's fixed-point iteration — per
    round solve ``L_w x = b(x_old)`` per coordinate, where

        b_i = Σ_{j∈N(i)} w_ij d_ij (x_i-x_j)/||x_i-x_j||
              + α Σ_{j∉N(i)} (x_i-x_j)/||x_i-x_j||^{q+2},

    w_ij = 1/d_ij². The reference drives its solves through LAMG; here the
    Laplacian solves are the repo's batched diagonal-preconditioned CG
    (operators/algebraic.py), all ``dim`` coordinates as one batched
    system, tol=0 (fixed schedule, deterministic). Both rhs halves sum to
    zero per coordinate (antisymmetric pair contributions, the repulsion
    pair set is symmetric), so the singular-Laplacian CG stays orthogonal
    to the constant nullspace; positions are re-centered each round.

    Repulsion: the reference approximates the entropy force with a
    quadtree; the distributed analog samples ``repulsion_samples``
    pseudo-random partners per node (hash60 rank-indexed, symmetrized,
    adjacents excluded) and scales by (n-1-deg)/s — O(n·s) rows, one
    shuffle. ``exact_repulsion`` computes the full non-adjacent pair set
    (fixture scale only, for the NumPy replica test).

    Returns (node, p0..p{dim-1}); for dim=2 also aliased (x, y)."""
    from .algebraic import conjugate_gradient
    from ..plans.order import zip_with_rank

    spark = graph.edges.sparkSession
    n = graph.num_nodes()
    if n == 0:
        # same schema as the populated path, so callers selecting p0/p1
        # (and x/y for dim=2) work on empty graphs too
        schema = "node long, " + ", ".join(f"p{k} double" for k in range(dim))
        if dim == 2:
            schema += ", x double, y double"
        return spark.createDataFrame([], schema)
    sym = (
        graph.sym()
        .select("src", "dst", "weight")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    sym.count()
    wgraph = Graph(
        sym.filter(F.col("src") < F.col("dst")).select(
            "src", "dst", (F.lit(1.0) / (F.col("weight") ** 2)).alias("weight")
        ),
        directed=False,
        weighted=True,
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed(
        "src", "node"
    )
    _rank_handle: list = []
    ranked = _cc(
        zip_with_rank(graph.nodes(), order_cols=("node",), cache_handle=_rank_handle)
    )
    for _h in _rank_handle:
        _h.unpersist()
    # ranked: (node, rank) with dense 1-based rank (the sampling code below
    # adds +1 when mapping modular partner indices) — partner index -> node id
    if init is not None:
        pos = init.select(
            "node", *[F.col(c).alias(f"p{k}") for k, c in enumerate(
                [c for c in init.columns if c != "node"][:dim]
            )]
        )
    else:
        pos = _maxent_positions_init(graph, dim, seed)
    pos = _cc(pos)
    eps = 1e-9
    for r in range(rounds):
        pu = pos.select(
            F.col("node").alias("src"),
            *[F.col(f"p{k}").alias(f"u{k}") for k in range(dim)],
        )
        pv = pos.select(
            F.col("node").alias("dst"),
            *[F.col(f"p{k}").alias(f"v{k}") for k in range(dim)],
        )
        d2 = None
        for k in range(dim):
            t = (F.col(f"u{k}") - F.col(f"v{k}")) ** 2
            d2 = t if d2 is None else d2 + t
        dist = F.greatest(F.sqrt(d2), F.lit(eps))
        att = (
            sym.join(pu, "src")
            .join(pv, "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(
                *[
                    F.sum(
                        (F.col(f"u{k}") - F.col(f"v{k}"))
                        / dist
                        / F.col("weight")  # w_ij d_ij = 1/d_ij
                    ).alias(f"a{k}")
                    for k in range(dim)
                ]
            )
        )
        if exact_repulsion:
            pairs = (
                ranked.select(F.col("node").alias("src"))
                .crossJoin(ranked.select(F.col("node").alias("dst")))
                .filter(F.col("src") != F.col("dst"))
                .join(sym.select("src", "dst"), ["src", "dst"], "left_anti")
                .withColumn("scale", F.lit(1.0))
            )
        else:
            s = repulsion_samples
            t_df = spark.range(s).withColumnRenamed("id", "t")
            cand = (
                ranked.crossJoin(F.broadcast(t_df))
                .select(
                    "node",
                    (
                        hash60(
                            F.concat_ws(
                                ":",
                                F.col("node").cast("string"),
                                F.col("t").cast("string"),
                                F.lit(f"rep{r}"),
                                F.lit(str(seed)),
                            )
                        )
                        % F.lit(n)
                        + F.lit(1)  # zip_with_rank ranks are 1-based
                    ).alias("prank"),
                )
            )
            half = (
                cand.join(
                    ranked.select(F.col("rank").alias("prank"), F.col("node").alias("partner")),
                    "prank",
                )
                .filter(F.col("node") != F.col("partner"))
                .select(F.col("node").alias("src"), F.col("partner").alias("dst"))
                .join(sym.select("src", "dst"), ["src", "dst"], "left_anti")
                .distinct()
            )
            pairs_unscaled = half.unionByName(
                half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ).distinct()
            pairs = (
                pairs_unscaled.join(deg, pairs_unscaled.src == deg.node, "left")
                .select(
                    "src",
                    "dst",
                    (
                        (F.lit(float(n - 1)) - F.coalesce("deg", F.lit(0.0)))
                        / F.lit(float(max(1, 2 * s)))
                    ).alias("scale"),
                )
            )
        rep = (
            pairs.join(pu, "src")
            .join(pv, "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(
                *[
                    F.sum(
                        F.col("scale")
                        * (F.col(f"u{k}") - F.col(f"v{k}"))
                        / F.pow(dist, F.lit(float(q + 2.0)))
                    ).alias(f"r{k}")
                    for k in range(dim)
                ]
            )
        )
        b = (
            graph.nodes()
            .join(att, "node", "left")
            .join(rep, "node", "left")
            .select(
                "node",
                *[
                    (
                        F.coalesce(f"a{k}", F.lit(0.0))
                        + F.lit(float(alpha)) * F.coalesce(f"r{k}", F.lit(0.0))
                    ).alias(f"b{k}")
                    for k in range(dim)
                ],
            )
        )
        # project the rhs onto the zero-sum subspace per coordinate: the
        # exact-repulsion / attraction halves are antisymmetric, but the
        # SAMPLED repulsion scale is per-source-degree, so its sum is only
        # approximately zero — any constant component is in the singular
        # Laplacian's nullspace and would poison the CG residual without
        # changing the layout (positions are re-centered anyway)
        bmeans = b.agg(
            *[F.avg(f"b{k}").alias(f"bm{k}") for k in range(dim)]
        )
        b = b.crossJoin(F.broadcast(bmeans)).select(
            "node",
            *[
                (F.col(f"b{k}") - F.col(f"bm{k}")).alias(f"b{k}")
                for k in range(dim)
            ],
        )
        rhs = None
        for k in range(dim):
            part = b.select(
                F.lit(k).cast("long").alias("sys"), "node", F.col(f"b{k}").alias("b")
            )
            rhs = part if rhs is None else rhs.unionByName(part)
        x = conjugate_gradient(wgraph, rhs, iters=cg_iters, tol=0.0, safeguard=True)
        wide = (
            x.groupBy("node")
            .pivot("sys", list(range(dim)))
            .agg(F.first("x"))
            .select(
                "node", *[F.col(str(k)).alias(f"p{k}") for k in range(dim)]
            )
        )
        means = wide.agg(
            *[F.avg(f"p{k}").alias(f"m{k}") for k in range(dim)]
        )
        pos = _cc(
            wide.crossJoin(F.broadcast(means)).select(
                "node",
                *[
                    (F.col(f"p{k}") - F.col(f"m{k}")).alias(f"p{k}")
                    for k in range(dim)
                ],
            )
        )
    sym.unpersist()
    if dim == 2:
        return pos.select(
            "node",
            "p0",
            "p1",
            F.col("p0").alias("x"),
            F.col("p1").alias("y"),
        )
    return pos
