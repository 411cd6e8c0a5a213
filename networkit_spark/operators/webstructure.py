"""Web-graph structure analytics: HITS, reciprocity, bow-tie decomposition,
power-law tail MLE, rich-club profile.

These are link-graph operators the reference does not ship (its nearest
surface is the centrality family, cpp/centrality/, and
cpp/components/StronglyConnectedComponents.cpp) but that every production
web-graph pipeline runs alongside PageRank — they are Spark-first extensions
for the web-scale tier, built from the same superstep machinery:

- :func:`hits` — Kleinberg's hubs-and-authorities power iteration
  (*Authoritative Sources in a Hyperlinked Environment*, JACM 1999), the
  same normalized-power-method shape as
  operators/pagerank.eigenvector_centrality but with the two-sided
  gather (authority over in-edges, hub over out-edges).
- :func:`reciprocity` — fraction of directed arcs whose reverse arc also
  exists (the standard first-order digraph statistic; one self-join).
- :func:`bowtie_decomposition` — Broder et al., *Graph structure in the
  web* (WWW 2000): classify every node as core / in / out / tube /
  tendril_in / tendril_out / disconnected relative to the largest SCC.
  Built from the distributed SCC (operators/components.py:117) plus four
  frontier BFS reachability sweeps — every superstep is the same
  frontier-semi-join + distinct shuffle shape as connected_components, so
  the decomposition runs at full graph scale (no driver state beyond
  per-round empty checks and the one largest-SCC id).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc
from ..plans.iterate import SuperstepDriver


def reciprocity(graph: Graph) -> float:
    """Fraction of non-loop arcs (u, v) whose reverse (v, u) is also an arc.

    0.0 on an arcless graph (documented convention; networkx raises). On an
    undirected graph every edge is reciprocal by construction → 1.0.
    """
    if not graph.directed:
        return 1.0 if not graph.edges.filter(F.col("src") != F.col("dst")).isEmpty() else 0.0
    arcs = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    row = (
        arcs.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count("*").alias("r"))
        .crossJoin(arcs.agg(F.count("*").alias("t")))
        .first()
    )
    return float(row["r"]) / float(row["t"]) if row["t"] else 0.0


def hits(
    graph: Graph,
    tol: float = 1e-8,
    max_iter: int = 100,
    fixed_iters: Optional[int] = None,
) -> DataFrame:
    """Hubs and authorities: ``(node, hub, auth)``, each vector L2-normalized.

    Per superstep (Kleinberg's normalized power method on AᵀA / AAᵀ):
    ``auth ← normalize(Aᵀ·hub)`` then ``hub ← normalize(A·auth)`` — two
    weighted gather-aggregates over the arc table plus two scalar norm
    collects; state is checkpointed once per superstep so lineage stays
    flat. ``fixed_iters`` pins the superstep count (oracle-parity mode);
    otherwise iterate until the combined L2 residual of both vectors is
    ≤ ``tol``. Undirected graphs use both orientations (hub = auth there).

    Scale shape: identical to PageRank's superstep — the arc table is the
    loop-invariant big side, only the O(n) score vectors move per round.
    The two gathers join the arcs on DIFFERENT keys (src for the authority
    gather, dst for the hub gather), so the arc table is pinned in BOTH
    hash layouts once (same rule as PageRank's pre-partitioned transition);
    each superstep's joins then satisfy their distribution from cache and
    only the O(n) score vector exchanges.
    """
    raw = graph.sym() if not graph.directed else graph.edges
    raw = raw.select("src", "dst", "weight")
    np_ = graph.edges.sparkSession.sparkContext.defaultParallelism
    arcs_src = raw.repartition(np_, "src").persist()
    arcs_dst = raw.repartition(np_, "dst").persist()
    arcs_src.count()
    arcs_dst.count()
    nodes = graph.nodes().persist()
    n = nodes.count()
    if n == 0:
        # empty graph: same explicit handling as bowtie_decomposition /
        # reciprocity — no nodes means no hubs or authorities
        arcs_src.unpersist()
        arcs_dst.unpersist()
        nodes.unpersist()
        return graph.edges.sparkSession.createDataFrame(
            [], "node long, hub double, auth double"
        )
    init = nodes.select(
        "node",
        F.lit(1.0 / math.sqrt(n)).alias("hub"),
        F.lit(1.0 / math.sqrt(n)).alias("auth"),
    )

    def _norm(frame: DataFrame, col: str) -> DataFrame:
        # 1-row L2 norm as an IN-PLAN broadcast aggregate over a cached
        # frame — a cheap subjob inside the next materialization, not a
        # driver collect
        return frame.agg(
            F.when(
                F.sqrt(F.sum(F.pow(col, 2))) > 0, F.sqrt(F.sum(F.pow(col, 2)))
            )
            .otherwise(F.lit(1.0))
            .alias(f"n_{col}")
        )

    held: list = []  # previous iteration's backing checkpoint

    def step(state: DataFrame, i: int):
        # authority: gather hub mass over IN-edges (src-keyed join → pinned
        # src layout); materialize ONCE, normalize lazily via the in-plan
        # norm so the half-step costs one job, not a job + a collect
        a_raw = (
            arcs_src.join(
                state.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("weight") * F.col("hub")).alias("mass"))
        )
        a_raw = (
            nodes.join(a_raw, nodes.node == a_raw.dst, "left")
            .select("node", F.coalesce("mass", F.lit(0.0)).alias("auth"))
            .localCheckpoint(eager=True)
        )
        auth = a_raw.crossJoin(F.broadcast(_norm(a_raw, "auth"))).select(
            "node", (F.col("auth") / F.col("n_auth")).alias("auth")
        )
        # hub: gather authority mass over OUT-edges (dst-keyed join → pinned
        # dst layout)
        h_raw = (
            arcs_dst.join(
                auth.select(F.col("node").alias("dst"), "auth"), "dst"
            )
            .groupBy("src")
            .agg(F.sum(F.col("weight") * F.col("auth")).alias("mass"))
        )
        raw = (
            nodes.join(h_raw, nodes.node == h_raw.src, "left")
            .select(
                "node",
                F.coalesce("mass", F.lit(0.0)).alias("hub"),
            )
            .join(auth, "node")
            .select("node", "hub", "auth")
            .localCheckpoint(eager=True)
        )
        new = raw.crossJoin(F.broadcast(_norm(raw, "hub"))).select(
            "node", (F.col("hub") / F.col("n_hub")).alias("hub"), "auth"
        )
        # a_raw is baked into raw's materialization; the PREVIOUS raw backs
        # the incoming lazy state — free it only after the residual read
        from ..plans.iterate import _free_checkpoint_blocks

        _free_checkpoint_blocks(a_raw)
        resid = None
        if fixed_iters is None:
            resid = (
                new.alias("a")
                .join(state.alias("b"), "node")
                .agg(
                    F.sqrt(
                        F.sum(
                            F.pow(F.col("a.hub") - F.col("b.hub"), 2)
                            + F.pow(F.col("a.auth") - F.col("b.auth"), 2)
                        )
                    ).alias("s")
                )
                .first()["s"]
            ) or 0.0
        for old in held:
            _free_checkpoint_blocks(old)
        held.clear()
        held.append(raw)
        return new, resid

    driver = SuperstepDriver(
        tol=tol,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        use_local_checkpoint=False,  # step() checkpoints before its collects
    )
    state = driver.run(init, step)
    arcs_src.unpersist()
    arcs_dst.unpersist()
    nodes.unpersist()
    return state.df


def _frontier_reach(arcs: DataFrame, seeds: DataFrame, forward: bool) -> DataFrame:
    """Nodes reachable from ``seeds`` (inclusive) along arcs, forward or
    backward — distributed frontier BFS; per round one semi-join-shaped
    frontier expansion + distinct + anti-join, same shuffle shape as
    connected_components. ``arcs`` should be persisted by the caller.

    Why frontier BFS and not shortcut doubling (the SCC color loop's
    trick): measured head-to-head at sf1/RMAT (5.9M arcs), a min-label +
    label-of-label doubling sweep costs 127 s vs 81 s for this loop inside
    bowtie_decomposition — web-graph reach regions are SHALLOW (a handful
    of hops), so the few frontier rounds touch only frontier-incident
    arcs, while every doubling round pays a whole-universe jump join +
    groupBy. Doubling only wins on deep-chain structures, which the SCC
    trim/color stages already absorb upstream of these sweeps."""
    step_src, step_dst = ("src", "dst") if forward else ("dst", "src")
    visited = _cc(seeds.select("node").distinct())
    frontier = visited
    while True:
        nxt = (
            arcs.join(frontier.withColumnRenamed("node", step_src), step_src)
            .select(F.col(step_dst).alias("node"))
            .distinct()
        )
        new = nxt.join(visited, "node", "left_anti").transform(_cc)
        if new.isEmpty():
            return visited
        visited = visited.unionByName(new).transform(_cc)
        frontier = new


#: region labels in canonical order
BOWTIE_REGIONS = (
    "core",
    "in",
    "out",
    "tube",
    "tendril_in",
    "tendril_out",
    "disconnected",
)


def bowtie_decomposition(graph: Graph) -> DataFrame:
    """Broder bow-tie regions relative to the LARGEST SCC: ``(node, region)``.

    Definitions (Broder et al. 2000, §3): with C the largest SCC (ties →
    smallest canonical component id), F the forward-reachable set of C and
    B the backward-reachable set,

    - ``core`` = C; ``out`` = F∖C; ``in`` = B∖C (F∩B = C: a node both
      reaching and reached by the core is mutually reachable with it),
    - among the remaining nodes R (neither in F nor B): ``tube`` = reachable
      from *in* AND reaching *out* (paths bypassing the core — a path from
      *in* through R cannot touch C, else the node would be in F),
      ``tendril_in`` = reachable from *in* only, ``tendril_out`` = reaching
      *out* only, ``disconnected`` = the rest.

    Four frontier BFS sweeps + one SCC call; only the largest-SCC id ever
    reaches the driver.
    """
    if not graph.directed:
        raise ValueError("bowtie_decomposition needs a directed graph")
    from .components import strongly_connected_components

    spark = graph.edges.sparkSession
    empty = spark.createDataFrame([], "node long, region string")
    arcs = graph.edges.select("src", "dst").distinct().persist()
    arcs.count()
    scc = strongly_connected_components(graph).persist()
    top = (
        scc.groupBy("component")
        .agg(F.count("*").alias("sz"))
        .orderBy(F.desc("sz"), F.asc("component"))
        .first()
    )
    if top is None:
        arcs.unpersist()
        scc.unpersist()
        return empty
    core = scc.filter(F.col("component") == top["component"]).select("node")
    core = _cc(core)

    fwd = _frontier_reach(arcs, core, forward=True)     # includes core
    bwd = _frontier_reach(arcs, core, forward=False)    # includes core
    out_s = fwd.join(core, "node", "left_anti").transform(_cc)
    in_s = bwd.join(core, "node", "left_anti").transform(_cc)
    rest = (
        graph.nodes()
        .join(fwd, "node", "left_anti")
        .join(bwd, "node", "left_anti")
        .transform(_cc)
    )
    # sweeps from IN (forward) and to OUT (backward), with expansion
    # RESTRICTED to R: a path from *in* to an R-node can only use IN∪R
    # intermediates (touching the core or F would put the node in F), and
    # every IN node is already a seed — so filtering arcs to dst∈R (resp.
    # src∈R) is exact AND keeps the sweep from flooding the whole F/B sets
    # through the core.
    f_in = (
        _frontier_reach(
            arcs.join(rest.withColumnRenamed("node", "dst"), "dst", "left_semi"),
            in_s,
            forward=True,
        )
        .join(rest, "node", "left_semi")
        .transform(_cc)
        if not in_s.isEmpty()
        else spark.createDataFrame([], "node long")
    )
    b_out = (
        _frontier_reach(
            arcs.join(rest.withColumnRenamed("node", "src"), "src", "left_semi"),
            out_s,
            forward=False,
        )
        .join(rest, "node", "left_semi")
        .transform(_cc)
        if not out_s.isEmpty()
        else spark.createDataFrame([], "node long")
    )

    def lab(df: DataFrame, region: str) -> DataFrame:
        return df.select("node", F.lit(region).alias("region"))

    tube = f_in.join(b_out, "node", "left_semi")
    tend_in = f_in.join(b_out, "node", "left_anti")
    tend_out = b_out.join(f_in, "node", "left_anti")
    disc = (
        rest.join(f_in, "node", "left_anti").join(b_out, "node", "left_anti")
    )
    result = (
        lab(core, "core")
        .unionByName(lab(in_s, "in"))
        .unionByName(lab(out_s, "out"))
        .unionByName(lab(tube, "tube"))
        .unionByName(lab(tend_in, "tendril_in"))
        .unionByName(lab(tend_out, "tendril_out"))
        .unionByName(lab(disc, "disconnected"))
        .localCheckpoint(eager=True)
    )
    arcs.unpersist()
    scc.unpersist()
    return result


def bowtie_profile(graph: Graph) -> DataFrame:
    """Region sizes ``(region, n_nodes, frac)`` — the headline numbers of the
    Broder paper (the web's ~27/21/21% core/in/out split). One extra agg over
    :func:`bowtie_decomposition`."""
    regions = bowtie_decomposition(graph)
    total = graph.num_nodes()
    return (
        regions.groupBy("region")
        .agg(F.count("*").alias("n_nodes"))
        .select(
            "region",
            "n_nodes",
            F.round(F.col("n_nodes") / F.lit(float(total)), 6).alias("frac"),
        )
    )


def powerlaw_alpha(graph: Graph, xmin: int = 1) -> float:
    """Discrete power-law exponent MLE over the degree distribution:
    ``alpha = 1 + n / Σ ln(d_i / (xmin - 0.5))`` over nodes with degree ≥
    ``xmin`` (Clauset–Shalizi–Newman, *Power-law distributions in empirical
    data*, SIAM Rev. 2009, eq. 3.7 — the standard web-graph tail check; the
    reference's nearest analog is the profiling module's gamma fit,
    networkit/profiling/stat.py). One filter + one aggregate — entirely
    whole-stage-codegen."""
    row = (
        graph.degrees()
        .filter(F.col("degree") >= xmin)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.log(F.col("degree") / F.lit(xmin - 0.5))).alias("s"),
        )
        .first()
    )
    if not row["n"] or not row["s"]:
        return float("nan")
    return 1.0 + float(row["n"]) / float(row["s"])


def rich_club(graph: Graph) -> DataFrame:
    """Rich-club profile ``(k, n_nodes, n_edges, phi)`` for every degree
    value k present: among the N_k nodes with degree > k, E_k surviving
    edges give ``phi(k) = 2·E_k / (N_k·(N_k−1))`` (Zhou & Mondragón 2004 —
    do hubs link to hubs more than degree alone predicts). No per-k loop:
    N_k and E_k are suffix sums over the degree histogram and the per-edge
    min-endpoint-degree histogram — two aggregates + two windowed running
    sums. The unpartitioned windows run over the HISTOGRAM (one row per
    distinct degree — O(√m) rows on a power-law graph, bounded by d_max),
    never over nodes or edges, so the single-partition sort is a few KB at
    any graph scale."""
    from pyspark.sql import Window

    deg = graph.degrees().persist()
    # suffix count of nodes with degree > k, evaluated at each present k
    dh = deg.groupBy("degree").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("degree")).rowsBetween(Window.unboundedPreceding, -1)
    nk = dh.select(
        F.col("degree").alias("k"),
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("n_nodes"),
    )
    # per-edge min endpoint degree (edges with BOTH endpoints deg > k form
    # the k-club), suffix-summed the same way
    ed = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .join(deg.select(F.col("node").alias("src"), F.col("degree").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("degree").alias("dd")), "dst")
        .select(F.least("ds", "dd").alias("md"))
    )
    eh = ed.groupBy("md").agg(F.count("*").alias("ecnt"))
    ek_w = Window.orderBy(F.desc("k")).rowsBetween(Window.unboundedPreceding, 0)
    # align edge histogram onto the node-degree thresholds: E_k = #edges
    # with md > k — left-join md rows ≥ each k is a suffix sum after a
    # union of the two key sets
    keys = nk.select("k")
    ek = (
        keys.join(eh.withColumnRenamed("md", "k"), "k", "left")
        .select("k", F.coalesce("ecnt", F.lit(0)).alias("ecnt"))
        .select(
            "k",
            (
                F.coalesce(
                    F.sum("ecnt").over(
                        Window.orderBy(F.desc("k")).rowsBetween(
                            Window.unboundedPreceding, 0
                        )
                    ),
                    F.lit(0),
                )
                - F.col("ecnt")
            ).alias("partial"),
        )
    )
    # 'partial' misses md values strictly between adjacent thresholds when
    # the edge histogram has keys absent from the node histogram — it can't:
    # md IS a node degree (the min endpoint's), so every md key appears in nk
    out = (
        nk.join(ek, "k")
        .select(
            "k",
            "n_nodes",
            F.col("partial").alias("n_edges"),
            F.when(
                F.col("n_nodes") > 1,
                2.0 * F.col("partial")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
            ).alias("phi"),
        )
        .orderBy("k")
    )
    out = out.localCheckpoint(eager=True)
    deg.unpersist()
    return out


def salsa(
    graph: Graph,
    tol: float = 1e-10,
    max_iter: int = 200,
    fixed_iters: Optional[int] = None,
) -> DataFrame:
    """SALSA hub/authority scores (Lempel & Moran, *The stochastic approach
    for link-structure analysis*, WWW 2000): ``(node, hub, auth)``.

    Unlike HITS' mutual reinforcement, SALSA runs two MASS-PRESERVING random
    walks on the bipartite hub/authority view: the authority chain steps
    backward along a uniformly-chosen in-link then forward along the chosen
    hub's out-links, i.e. per superstep

        h(q)  = Σ_p  W(q,p)/indeg_w(p)  · a(p)     (backward half-step)
        a'(r) = Σ_q  W(q,r)/outdeg_w(q) · h(q)     (forward half-step)

    and the hub chain is the mirror image. Both walks conserve probability
    mass, so there is no per-step normalization (and no norm collects —
    cheaper supersteps than HITS); the stationary authority vector is
    in-degree-proportional within each component of the co-citation graph.
    Nodes with no in-links get auth 0; no out-links → hub 0.

    Plan shape: both normalized transitions are derived once and pinned in
    BOTH hash layouts (each chain joins the transition on src AND on dst per
    superstep — same dual-layout rule as :func:`hits`); the arc table never
    reshuffles, only the O(n) mass vectors move.
    """
    arcs = graph.sym() if not graph.directed else graph.edges
    arcs = arcs.select("src", "dst", "weight")
    outd = arcs.groupBy("src").agg(F.sum("weight").alias("od"))
    ind = arcs.groupBy("dst").agg(F.sum("weight").alias("idg"))
    trans0 = (
        arcs.join(outd, "src")
        .join(ind, "dst")
        .select(
            "src",
            "dst",
            (F.col("weight") / F.col("od")).alias("p_fwd"),   # hub q -> auth r
            (F.col("weight") / F.col("idg")).alias("p_bwd"),  # auth p -> hub q
        )
    )
    np_ = graph.edges.sparkSession.sparkContext.defaultParallelism
    trans_src = trans0.repartition(np_, "src").persist()
    trans_dst = trans0.repartition(np_, "dst").persist()
    trans_src.count()
    trans_dst.count()
    trans = trans_src
    auth_side = trans.select(F.col("dst").alias("node")).distinct().persist()
    hub_side = trans.select(F.col("src").alias("node")).distinct().persist()
    n_auth = auth_side.count()
    n_hub = hub_side.count()
    if n_auth == 0 or n_hub == 0:
        # arcless graph: every node is neither hub nor authority (consistent
        # with hits()'s empty-graph early return)
        for df in (trans_src, trans_dst, auth_side, hub_side):
            df.unpersist()
        return graph.nodes().select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )
    a = auth_side.select("node", F.lit(1.0 / n_auth).alias("a"))
    h0 = hub_side.select("node", F.lit(1.0 / n_hub).alias("h"))
    state = (
        graph.nodes()
        .join(a, "node", "left")
        .join(h0, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0.0)).alias("hub"),
            F.coalesce("a", F.lit(0.0)).alias("auth"),
        )
    )

    def step(st: DataFrame, i: int):
        hb = (
            trans_dst.join(st.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("p_bwd") * F.col("auth")).alias("h"))
        )
        anew = (
            trans_src.join(
                hb.withColumnRenamed("src", "s2"), trans_src.src == F.col("s2")
            )
            .groupBy("dst")
            .agg(F.sum(F.col("p_fwd") * F.col("h")).alias("a"))
        )
        # mirror chain for hubs: forward along out-links then backward
        ab = (
            trans_src.join(st.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("p_fwd") * F.col("hub")).alias("a2"))
        )
        hnew = (
            trans_dst.join(
                ab.withColumnRenamed("dst", "d2"), trans_dst.dst == F.col("d2")
            )
            .groupBy("src")
            .agg(F.sum(F.col("p_bwd") * F.col("a2")).alias("h2"))
        )
        new = (
            graph.nodes()
            .join(hnew.withColumnRenamed("src", "node"), "node", "left")
            .join(anew.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.coalesce("h2", F.lit(0.0)).alias("hub"),
                F.coalesce("a", F.lit(0.0)).alias("auth"),
            )
            .localCheckpoint(eager=True)
        )
        if fixed_iters is not None:
            return new, None
        resid = (
            new.alias("x")
            .join(st.alias("y"), "node")
            .agg(
                F.sum(
                    F.abs(F.col("x.hub") - F.col("y.hub"))
                    + F.abs(F.col("x.auth") - F.col("y.auth"))
                ).alias("s")
            )
            .first()["s"]
        )
        return new, resid or 0.0

    driver = SuperstepDriver(
        tol=tol,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        use_local_checkpoint=False,
    )
    out = driver.run(state, step).df
    trans_src.unpersist()
    trans_dst.unpersist()
    auth_side.unpersist()
    hub_side.unpersist()
    return out


def avg_neighbor_degree(graph: Graph) -> DataFrame:
    """Per-node average neighbor degree ``(node, and_deg)`` — one adjacency
    join against the degree table + one aggregate. Isolated nodes get 0."""
    deg = graph.degrees()
    sym = graph.sym().select("src", "dst")
    nbr = (
        sym.join(deg.select(F.col("node").alias("dst"), "degree"), "dst")
        .groupBy("src")
        .agg(F.avg(F.col("degree").cast("double")).alias("and_deg"))
        .withColumnRenamed("src", "node")
    )
    return graph.nodes().join(nbr, "node", "left").select(
        "node", F.coalesce("and_deg", F.lit(0.0)).alias("and_deg")
    )


def knn_degree_correlation(graph: Graph) -> DataFrame:
    """Degree-correlation profile ``(k, knn)``: mean average-neighbor-degree
    over nodes of degree k (Pastor-Satorras, Vázquez & Vespignani 2001 —
    rising knn(k) = assortative, falling = disassortative; the curve behind
    the scalar ``assortativity`` coefficient). Built on
    :func:`avg_neighbor_degree`; output is one row per present degree."""
    annd = avg_neighbor_degree(graph)
    deg = graph.degrees()
    return (
        deg.join(annd, "node")
        .groupBy(F.col("degree").alias("k"))
        .agg(F.avg("and_deg").alias("knn"))
        .orderBy("k")
    )
