"""Remaining operator surface: diameter estimation, algebraic distance,
Luby's independent set, Borůvka spanning forest, personalized PageRank +
PageRankNibble sweep.

Reference files:
- cpp/distance/Diameter.{h,cpp} (iFub exact + estimatedRange via 2-sweep)
- cpp/distance/AlgebraicDistance.cpp (~100 LoC, iterative smoothing)
- cpp/independentset/Luby.cpp (random-priority maximal independent set)
- cpp/graph/SpanningForest.cpp / KruskalMSF (sequential union-find → here
  Borůvka min-edge supersteps, the textbook distributed MSF)
- cpp/scd/ApproximatePageRank.{h,cpp} + PageRankNibble.{h,cpp}
  (_NetworKit.pyx:6628-6640): seeded community via personalized PR +
  conductance sweep cut.
"""

from __future__ import annotations

import math

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.dedup import hash60
from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc
from .distance import bfs_distances


def diameter_range(graph: Graph, start: Optional[int] = None) -> tuple[int, int]:
    """Diameter 2-sweep estimate (Diameter.h estimatedRange): BFS from a
    start node, then BFS from the farthest node found; returns
    (lower_bound, upper_bound) = (ecc2, 2*ecc2)."""
    if start is None:
        start = int(graph.nodes().agg(F.min("node")).collect()[0][0])
    d1 = bfs_distances(graph, start)
    far = d1.orderBy(F.desc("dist"), F.asc("node")).limit(1).collect()[0]
    d2 = bfs_distances(graph, int(far["node"]))
    ecc2 = int(d2.agg(F.max("dist")).collect()[0][0] or 0)
    return ecc2, 2 * ecc2


def _bfs_from_starts(sym, starts: DataFrame, max_iter: int = 10_000) -> DataFrame:
    """(node, dist) hop counts from a SET of start nodes (one per component;
    each BFS stays inside its component so one pair-free frontier serves all
    components at once — the distributed analog of G.BFSfrom(startNodes))."""
    dist = starts.select("node", F.lit(0).alias("dist")).localCheckpoint(eager=True)
    frontier = dist
    while max_iter > 0:
        max_iter -= 1
        reach = (
            sym.join(frontier, sym.src == frontier.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        new = reach.join(dist, "node", "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            break
        dist = dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return dist


def _pair_bfs_ecc(sym, sources: DataFrame, max_iter: int = 10_000) -> DataFrame:
    """Exact eccentricity for a BATCH of source nodes via one level-
    synchronous (source, node) pair frontier — |sources| BFS trees for one
    BFS's worth of supersteps. Returns (source, ecc)."""
    dist = sources.select(
        F.col("node").alias("source"), F.col("node"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist
    hop = 0
    while max_iter > 0:
        max_iter -= 1
        hop += 1
        reach = (
            sym.join(frontier, sym.src == frontier.node)
            .select("source", F.col("dst").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
        )
        new = reach.join(dist, ["source", "node"], "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            break
        dist = dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return dist.groupBy("source").agg(F.max("dist").alias("ecc"))


def diameter_bounds_sumsweep(
    graph: Graph, error: float = 0.0, max_rounds: Optional[int] = None
) -> tuple[int, int]:
    """Exact-capable diameter bounds via the reference's modified exactSumSweep
    (Diameter.cpp:83-230, the ``exact`` mode of Diameter.h:17 — Borassi et
    al.'s BFS bound tightening): per round, pick one start node per connected
    component (round 0: max degree; then alternately the node with the worst
    upper bound and the most central node closest to the previous start), run
    ONE multi-start BFS, and tighten per-node eccentricity bounds
      lb(u) = max(lb(u), max(d(u), ecc_c - d(u)))
      ub(u) = eccVal          if d(u) <= distFirst_c
            = min(ub(u), d(u) + ecc_c - 2*distFirst_c)   otherwise
    where ecc_c = the BFS's eccentricity in u's component and distFirst_c =
    the BFS depth of the first degree->=2 node. Terminates when
    max(ub) <= (1+error)*max(lb); with error=0 that is the EXACT diameter.

    Spark shape: the per-node bound table is a DataFrame superstep state; the
    per-component start selection is a ``max_by`` aggregation (no driver loop
    over components), the BFS is the frontier join, and only the two global
    bound scalars are collected per round — scale-safe for any component
    count. Start-selection ties break by node id (the reference's scan order
    resolves them arbitrarily; bounds stay exact under any choice).

    Tail handling: the reference iterates up to 2n single BFS rounds — on
    small-diameter dense graphs the bound updates finish only the start node
    per round (ub(u) = d(u) + ecc(s) rarely dips below the diameter), which
    is milliseconds sequentially but seconds-per-BFS as supersteps. After
    ``max_rounds`` SumSweep rounds (default 10) the residual STUCK set
    (ub > global lb) is finished EXACTLY in one batched multi-source pair
    BFS (_pair_bfs_ecc) — |stuck| eccentricities for one BFS's worth of
    supersteps. On web-scale power-law graphs the stuck set after a few
    sweeps is small (the algorithm's design premise); the pair frontier is
    O(|stuck| · n) rows, partitioned like any edge join.
    """
    from .components import connected_components

    sym = graph.sym_part().persist()
    sym.count()
    n = graph.num_nodes()
    comp = connected_components(graph).select(
        "node", F.col("component").alias("comp")
    )
    state = (
        graph.nodes()
        .join(comp, "node")
        .join(graph.degrees(), "node")
        .select(
            "node", "comp", "degree",
            F.lit(0).alias("lb"),
            F.lit(n).alias("ub"),
            F.lit(False).alias("finished"),
            F.lit(0).alias("dist"),
        )
        .transform(_cc)
    )
    if max_rounds is None:
        max_rounds = 10

    def run_round(starts: DataFrame) -> tuple[DataFrame, int, int]:
        d = _bfs_from_starts(sym, starts)
        st = state.drop("dist").join(d, "node")
        per_comp = st.groupBy("comp").agg(
            F.max("dist").alias("ecc"),
            F.coalesce(
                F.min(F.when(F.col("degree") > 1, F.col("dist"))), F.lit(0)
            ).alias("dist_first"),
        )
        ecc_val = F.greatest(F.col("dist"), F.col("ecc") - F.col("dist"))
        new_lb = F.when(F.col("finished"), F.col("lb")).otherwise(
            F.greatest(F.col("lb"), ecc_val)
        )
        new_ub = F.when(F.col("finished"), F.col("ub")).otherwise(
            F.when(F.col("dist") <= F.col("dist_first"), ecc_val).otherwise(
                F.least(F.col("ub"), F.col("dist") + F.col("ecc") - 2 * F.col("dist_first"))
            )
        )
        upd = (
            st.join(per_comp, "comp")
            .select(
                "node", "comp", "degree", "dist",
                new_lb.alias("lb"), new_ub.alias("ub"),
            )
            .withColumn("finished", F.col("ub") == F.col("lb"))
            .transform(_cc)
        )
        row = upd.agg(F.max("lb").alias("lb"), F.max("ub").alias("ub")).collect()[0]
        return upd, int(row["lb"]), int(row["ub"])

    # round 0: highest-degree node per component (ties -> highest id, like
    # the reference's ascending scan with >=)
    starts = state.groupBy("comp").agg(
        F.max_by("node", F.struct("degree", "node")).alias("node")
    )
    state, lb, ub = run_round(starts)
    i = 0
    while i < max_rounds and ub > lb + error * lb:
        if i % 2 == 0:
            # worst upper bound, farthest from the previous start
            starts = state.groupBy("comp").agg(
                F.max_by(
                    "node", F.struct("ub", "dist", (-F.col("node")).alias("t"))
                ).alias("node")
            )
        else:
            # most central (lowest lb + dist), tie: farthest from prev start
            starts = state.groupBy("comp").agg(
                F.max_by(
                    "node",
                    F.struct(
                        (-(F.col("lb") + F.col("dist"))).alias("k"),
                        F.col("dist"),
                        (-F.col("node")).alias("t"),
                    ),
                ).alias("node")
            )
        state, lb, ub = run_round(starts)
        i += 1
    if ub > lb + error * lb:
        # exact tail: batched eccentricities of every node whose upper bound
        # still exceeds the best lower bound
        stuck = state.filter(F.col("ub") > lb).select("node")
        eccs = _pair_bfs_ecc(sym, stuck)
        row = eccs.agg(F.max("ecc").alias("m")).collect()[0]
        lb = max(lb, int(row["m"] or 0))
        ub = lb
    sym.unpersist()
    return lb, ub


def diameter_exact(graph: Graph, max_rounds: Optional[int] = None) -> int:
    """Exact diameter (Diameter.cpp exactDiameter, unweighted path:
    estimatedDiameterRange with error 0 — lb meets ub). ``max_rounds``
    caps the SumSweep phase; the batched-eccentricity tail keeps the result
    exact for any cap (small caps shift work to the one batched pair BFS —
    the right trade on small-diameter graphs where sweeps finish one node
    per round)."""
    lb, ub = diameter_bounds_sumsweep(graph, error=0.0, max_rounds=max_rounds)
    if lb != ub:
        raise RuntimeError(
            f"diameter_exact: bounds did not converge (lb={lb}, ub={ub})"
        )
    return lb


def estimated_vertex_diameter(graph: Graph, samples: int, seed: int = 42) -> int:
    """Diameter.h estimatedSamples mode (Diameter.cpp:232-271): for each of
    ``samples`` sampled nodes, BFS and take (largest + second-largest
    distance) + 1 as a vertex-diameter estimate; return the max.

    Spark shape: sampled starts are the ``samples`` smallest seeded-hash
    nodes (reference: randomNode draws — documented determinism deviation,
    same convention as graphlayout._pivots), and ALL sample BFSs run as ONE
    batched multi-source frontier (distance.multi_source_bfs), so the cost
    is one BFS's worth of supersteps."""
    from .distance import multi_source_bfs

    h = hash60(F.concat_ws(":", F.col("node").cast("string"), F.lit(str(seed))))
    starts = [
        int(r["node"])
        for r in graph.nodes()
        .select("node", h.alias("h"))
        .orderBy("h", "node")
        .limit(samples)
        .collect()
    ]
    dist = multi_source_bfs(graph, starts)
    # per source: largest distance value and the second-largest VALUE
    # (duplicates count — two nodes at max distance give maxD2 == maxD,
    # Diameter.cpp:243-251's running scan)
    ranked = (
        dist.groupBy("source", "dist")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.col("dist").desc())
            ),
        )
    )
    rows = (
        ranked.filter(F.col("rk") <= 2)
        .groupBy("source")
        .agg(
            F.max("dist").alias("d1"),
            F.min("dist").alias("d2"),
            F.max(F.when(F.col("rk") == 1, F.col("c"))).alias("c1"),
        )
        .select(
            (
                F.col("d1")
                + F.when(F.col("c1") >= 2, F.col("d1")).otherwise(
                    F.when(F.col("d2") < F.col("d1"), F.col("d2")).otherwise(F.lit(0))
                )
                + 1
            ).alias("vd")
        )
        .agg(F.max("vd").alias("vd"))
        .collect()
    )
    return int(rows[0]["vd"] or 0)


def estimated_vertex_diameter_pedantic(graph: Graph) -> int:
    """Diameter.h estimatedPedantic mode (Diameter.cpp:276-318): unweighted
    graphs take, PER CONNECTED COMPONENT, a BFS from the component's
    first node in iteration order (here: its smallest id — the reference
    scans nodes in id order and starts at the first unvisited one) and
    estimate maxD + maxD2 (+1 overall); weighted graphs return the largest
    component's size. All component BFSs batch into one multi-source
    frontier."""
    from .components import connected_components
    from .distance import multi_source_bfs

    comp = connected_components(graph)
    if graph.weighted:
        sizes = comp.groupBy("component").count().agg(F.max("count")).collect()
        return int(sizes[0][0] or 0)
    starts = [
        int(r["m"])
        for r in comp.groupBy("component").agg(F.min("node").alias("m")).collect()
    ]
    dist = multi_source_bfs(graph, starts)
    ranked = (
        dist.groupBy("source", "dist")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.col("dist").desc())
            ),
        )
    )
    rows = (
        ranked.filter(F.col("rk") <= 2)
        .groupBy("source")
        .agg(
            F.max("dist").alias("d1"),
            F.min("dist").alias("d2"),
            F.max(F.when(F.col("rk") == 1, F.col("c"))).alias("c1"),
        )
        .select(
            (
                F.col("d1")
                + F.when(F.col("c1") >= 2, F.col("d1")).otherwise(
                    F.when(F.col("d2") < F.col("d1"), F.col("d2")).otherwise(F.lit(0))
                )
            ).alias("vd")
        )
        .agg(F.max("vd").alias("vd"))
        .collect()
    )
    return int(rows[0]["vd"] or 0) + 1


def algebraic_distance(
    graph: Graph, num_systems: int = 8, num_iters: int = 10, omega: float = 0.5, seed: int = 42
) -> DataFrame:
    """AlgebraicDistance.cpp: iterate Jacobi over-relaxation smoothing of
    ``num_systems`` random node vectors; per-edge distance = max coordinate
    difference. Init is hash-seeded (deterministic). Returns
    (src, dst, score)."""
    nodes = graph.nodes()
    cols = []
    for s in range(num_systems):
        # portable md5-based hash60 init (reproducible in any engine)
        u = F.pmod(
            hash60(
                F.concat_ws(
                    "|", F.col("node").cast("string"), F.lit(str(s)), F.lit(str(seed))
                )
            ),
            F.lit(2 ** 52),
        ).cast("double") / F.lit(float(2 ** 52))
        cols.append(u.alias(f"x{s}"))
    x = nodes.select("node", *cols).localCheckpoint(eager=True)
    sym = graph.sym_part(key="dst", cols=("src", "dst", "weight")).persist()
    wdeg = graph.weighted_degrees().persist()
    for _ in range(num_iters):
        nbr = (
            sym.join(x, sym.dst == x.node)
            .groupBy(F.col("src").alias("node"))
            .agg(*[F.sum(F.col(f"x{s}") * F.col("weight")).alias(f"n{s}") for s in range(num_systems)])
        )
        x = (
            x.join(nbr, "node", "left")
            .join(wdeg, "node")
            .select(
                "node",
                *[
                    (
                        F.lit(1 - omega) * F.col(f"x{s}")
                        + F.lit(omega) * F.coalesce(F.col(f"n{s}") / F.col("wdeg"), F.col(f"x{s}"))
                    ).alias(f"x{s}")
                    for s in range(num_systems)
                ],
            )
            .localCheckpoint(eager=True)
        )
    xu = x.select(F.col("node").alias("src"), *[F.col(f"x{s}").alias(f"u{s}") for s in range(num_systems)])
    xv = x.select(F.col("node").alias("dst"), *[F.col(f"x{s}").alias(f"v{s}") for s in range(num_systems)])
    diffs = [F.abs(F.col(f"u{s}") - F.col(f"v{s}")) for s in range(num_systems)]
    sym.unpersist()
    wdeg.unpersist()
    return (
        graph.edges.join(xu, "src").join(xv, "dst")
        .select("src", "dst", F.greatest(*diffs).alias("score"))
    )


def luby_independent_set(graph: Graph, seed: int = 42, max_iter: int = 100) -> DataFrame:
    """Luby.cpp: maximal independent set via random priorities — per round,
    nodes that beat all undecided neighbors' hash-priorities join the set;
    their neighbors drop out. Deterministic (hash priorities), O(log n)
    rounds w.h.p. Returns (node) of the MIS."""
    sym = graph.sym_part().filter(F.col("src") != F.col("dst")).persist()
    undecided = graph.nodes().transform(_cc)
    chosen = None
    rnd = 0
    while rnd < max_iter:
        rnd += 1
        # portable 60-bit md5 hash (functions/dedup.hash60) so the priority
        # sequence is reproducible in any engine (DuckDB oracle parity)
        pri = undecided.select(
            "node",
            hash60(
                F.concat_ws(
                    "|", F.col("node").cast("string"), F.lit(str(seed)), F.lit(str(rnd))
                )
            ).alias("pri"),
        )
        e = (
            sym.join(pri.withColumnRenamed("node", "src").withColumnRenamed("pri", "ps"), "src")
            .join(pri.withColumnRenamed("node", "dst").withColumnRenamed("pri", "pd"), "dst")
        )
        # a node loses if any undecided neighbor has (pri, id) greater
        losers = e.filter(
            (F.col("pd") > F.col("ps"))
            | ((F.col("pd") == F.col("ps")) & (F.col("dst") > F.col("src")))
        ).select(F.col("src").alias("node")).distinct()
        winners = pri.select("node").join(losers, "node", "left_anti").transform(_cc)
        if winners.isEmpty():
            break
        chosen = winners if chosen is None else chosen.unionByName(winners).transform(_cc)
        nbrs_of_winners = (
            sym.join(winners.withColumnRenamed("node", "src"), "src", "left_semi")
            .select(F.col("dst").alias("node")).distinct()
        )
        undecided = (
            undecided.join(winners, "node", "left_anti")
            .join(nbrs_of_winners, "node", "left_anti")
            .transform(_cc)
        )
        if undecided.isEmpty():
            break
    sym.unpersist()
    return chosen if chosen is not None else undecided.limit(0)


def spanning_forest(graph: Graph, max_iter: int = 64, minimum: bool = True) -> DataFrame:
    """Borůvka supersteps (SpanningForest / KruskalMSF analog — Kruskal's
    union-find is sequential; Borůvka is the distributed classic): per round
    every component picks its cheapest outgoing edge (deterministic
    tie-break by (weight, src, dst)), merges via hash-to-min on the picked
    edges. Returns the forest edges (src, dst, weight)."""
    sign = 1.0 if minimum else -1.0
    comp = graph.nodes().select("node", F.col("node").alias("comp")).transform(_cc)
    edges = graph.edges.filter(F.col("src") != F.col("dst")).persist()
    forest = None
    for _ in range(max_iter):
        ec = (
            edges.join(comp.withColumnRenamed("node", "src").withColumnRenamed("comp", "cs"), "src")
            .join(comp.withColumnRenamed("node", "dst").withColumnRenamed("comp", "cd"), "dst")
            .filter(F.col("cs") != F.col("cd"))
        )
        if ec.isEmpty():
            break
        # cheapest outgoing edge per component (consider both directions)
        cand = ec.select(F.col("cs").alias("c"), "src", "dst", "weight").unionByName(
            ec.select(F.col("cd").alias("c"), "src", "dst", "weight")
        )
        w = Window.partitionBy("c").orderBy(
            (F.col("weight") * sign).asc(), F.col("src").asc(), F.col("dst").asc()
        )
        picked = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src", "dst", "weight")
            .distinct()
            .transform(_cc)
        )
        forest = picked if forest is None else forest.unionByName(picked).distinct().transform(_cc)
        # merge components over picked edges: hash-to-min until stable
        pe = picked.join(comp.withColumnRenamed("node", "src").withColumnRenamed("comp", "cs"), "src") \
                   .join(comp.withColumnRenamed("node", "dst").withColumnRenamed("comp", "cd"), "dst") \
                   .select("cs", "cd")
        pe = pe.unionByName(pe.select(F.col("cd").alias("cs"), F.col("cs").alias("cd")))
        mapping = comp.select(F.col("comp").alias("c")).distinct().select("c", F.col("c").alias("root"))
        converged = False
        for _ in range(max_iter):
            nbr = (
                pe.join(mapping.withColumnRenamed("c", "cs").withColumnRenamed("root", "rs"), "cs")
                .groupBy(F.col("cd").alias("c"))
                .agg(F.min("rs").alias("cand_root"))
            )
            new_map = (
                mapping.join(nbr, "c", "left")
                .select("c", F.least(F.col("root"), F.coalesce("cand_root", F.col("root"))).alias("root"))
            )
            # pointer jumping (root := root(root)) — chains halve per round,
            # so a length-L merge chain converges in O(log L) rounds instead
            # of L; without it the inner cap silently left components
            # UNMERGED and a later round could pick a cycle-closing edge
            jump = new_map.select(
                F.col("c").alias("_jc"), F.col("root").alias("_jr")
            )
            new_map = (
                new_map.join(jump, new_map["root"] == jump["_jc"], "left")
                .select(
                    "c",
                    F.coalesce(F.col("_jr"), F.col("root")).alias("root"),
                )
                .transform(_cc)
            )
            changed = (
                new_map.alias("a").join(mapping.alias("b"), "c")
                .filter(F.col("a.root") != F.col("b.root")).count()
            )
            mapping = new_map
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                "spanning_forest: component merge did not converge — "
                "raise max_iter (pointer jumping needs O(log n) rounds)"
            )
        comp = (
            comp.join(mapping.withColumnRenamed("c", "comp"), "comp")
            .select("node", F.col("root").alias("comp"))
            .transform(_cc)
        )
    edges.unpersist()
    if forest is None:
        return graph.edges.limit(0)
    return forest


def personalized_pagerank(
    graph: Graph,
    seeds: list[int],
    damp: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    fixed_iters: "int | None" = None,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """ApproximatePageRank analog (push-based in the reference,
    cpp/scd/ApproximatePageRank.h:20-35; here the same fixpoint via global
    power iteration with teleport restricted to the seed set).

    ``fixed_iters`` runs exactly that many supersteps with no residual
    collect (oracle-parity mode, same convention as operators.pagerank).
    The n-row rank vector is broadcast into the superstep join only below
    ``broadcast_threshold`` nodes (same gate as operators.pagerank) — above
    it the joins shuffle, since force-broadcasting O(n) rows per iteration
    is exactly the driver/executor pressure the gate exists to avoid."""
    import math

    n_seeds = len(seeds)
    bcast = (
        (lambda df: F.broadcast(df))
        if graph.num_nodes() <= broadcast_threshold
        else (lambda df: df)
    )
    nodes = graph.nodes().persist()
    out = graph.sym()
    wdeg = out.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    trans = out.join(wdeg, "src").select(
        "src", "dst", (F.col("weight") / F.col("wdeg")).alias("p")
    ).persist()
    trans.count()
    seed_df = nodes.select(
        "node",
        F.when(F.col("node").isin(seeds), F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0)).alias("tele"),
    ).persist()
    ranks = seed_df.select("node", F.col("tele").alias("score")).localCheckpoint(eager=True)
    for _ in range(fixed_iters if fixed_iters is not None else max_iter):
        sums = (
            trans.join(bcast(ranks), trans.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("score")).alias("mass"))
        )
        new = (
            seed_df.join(bcast(sums), seed_df.node == sums.dst, "left")
            .select(
                "node",
                (F.lit(damp) * F.coalesce("mass", F.lit(0.0)) + F.lit(1 - damp) * F.col("tele")).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
        if fixed_iters is not None:
            ranks = new
            continue
        resid = (
            new.alias("a").join(ranks.alias("b"), "node")
            .agg(F.sum(F.abs(F.col("a.score") - F.col("b.score"))).alias("s"))
            .collect()[0]["s"]
        )
        ranks = new
        if (resid or 0.0) <= tol:
            break
    trans.unpersist()
    nodes.unpersist()
    seed_df.unpersist()
    return ranks


def pagerank_nibble(
    graph: Graph,
    seed: int,
    damp: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    round_digits: int | None = None,
    support_eps: float = 0.0,
) -> DataFrame:
    """PageRankNibble (cpp/scd/PageRankNibble.{h,cpp}): personalized PR from
    the seed, order nodes by score/degree, take the prefix with minimum
    conductance (sweep cut via distributed running sums). Returns (node)
    of the detected community.

    ``round_digits`` rounds the sweep key and conductance before ordering so
    the sweep order is reproducible across float-summation orders (oracle
    parity); ``tol < 0`` runs exactly ``max_iter`` PPR iterations.

    Scale note: the power-iteration PPR has NO push-style truncation, so
    with the default ``support_eps=0`` the sweep covers every node the
    iteration count reaches — potentially the whole component. Corpus-scale
    callers set ``support_eps > 0``: scores sum to 1, so the truncated
    support is at most ``1/support_eps`` rows (the analog of the
    reference's ApproximatePageRank residual threshold). Either way the
    sweep itself is distributed — exact global ranks + running sums via
    plans/order.zip_with_rank (range shuffle + per-partition windows),
    never a single-task global window."""
    from ..plans.order import zip_with_rank

    ppr = personalized_pagerank(graph, [seed], damp=damp, tol=tol, max_iter=max_iter)
    deg = graph.weighted_degrees()
    total_vol = deg.agg(F.sum("wdeg")).collect()[0][0] or 0.0
    key = F.col("score") / F.col("wdeg")
    if round_digits is not None:
        key = F.round(key, round_digits)
    cache: list = []
    ordered = zip_with_rank(
        ppr.filter(F.col("score") > support_eps)
        .join(deg, "node")
        .select("node", key.alias("key"), "wdeg"),
        [F.col("key").desc(), F.col("node").asc()],
        rank_col="pos",
        cache_handle=cache,
    ).persist()
    # cut(prefix) computed per position: edges with exactly one endpoint in prefix
    pos_map = ordered.select("node", "pos")
    e = (
        graph.sym()
        .join(pos_map.withColumnRenamed("node", "src").withColumnRenamed("pos", "ps"), "src", "left")
        .join(pos_map.withColumnRenamed("node", "dst").withColumnRenamed("pos", "pd"), "dst", "left")
        .select(
            F.coalesce("ps", F.lit(2 ** 62)).alias("ps"),
            F.coalesce("pd", F.lit(2 ** 62)).alias("pd"),
            "weight",
        )
    )
    # for prefix length L: edge (ps, pd) is cut iff min(ps,pd) <= L < max(ps,pd)
    lo = F.least("ps", "pd")
    hi = F.greatest("ps", "pd")
    deltas = (
        e.filter(lo < hi)
        .select(lo.alias("enter"), hi.alias("leave"), "weight")
    )
    enters = deltas.groupBy(F.col("enter").alias("pos")).agg(F.sum("weight").alias("w_in"))
    leaves = deltas.groupBy(F.col("leave").alias("pos")).agg(F.sum("weight").alias("w_out"))
    swbase = (
        ordered.select("pos", "wdeg")
        .join(enters, "pos", "left")
        .join(leaves, "pos", "left")
        .select(
            "pos",
            "wdeg",
            F.coalesce("w_in", F.lit(0.0)).alias("w_in"),
            F.coalesce("w_out", F.lit(0.0)).alias("w_out"),
        )
    )
    sweep = (
        zip_with_rank(
            swbase,
            [F.col("pos").asc()],
            rank_col="_sp",
            cum_cols=["wdeg", "w_in", "w_out"],
            cache_handle=cache,
        )
        .select(
            "pos",
            F.col("cum_wdeg").alias("vol"),
            (F.col("cum_w_in") - F.col("cum_w_out")).alias("cut"),
        )
        .withColumn(
            "cond",
            F.when(
                F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")) > 0,
                F.col("cut") / F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")),
            ).otherwise(F.lit(float("inf"))),
        )
    )
    if round_digits is not None:
        sweep = sweep.withColumn("cond", F.round("cond", round_digits))
    best = sweep.orderBy(F.asc("cond"), F.asc("pos")).limit(1).collect()
    if not best:
        ordered.unpersist()
        for df in cache:
            df.unpersist()
        return graph.nodes().filter(F.col("node") == seed).select("node")
    best_pos = best[0]["pos"]
    out = ordered.filter(F.col("pos") <= best_pos).select("node").localCheckpoint(eager=True)
    ordered.unpersist()
    for df in cache:
        df.unpersist()
    return out


def pseudo_random_spanning_tree(graph: Graph, seed: int = 42) -> DataFrame:
    """PseudoRandomSpanningTree.cpp:18-49: Kruskal over weights perturbed by
    a tiny random value, processed in DECREASING order (maximum spanning
    forest). Distributed version: the perturbation is a seeded hash of the
    edge (reproducible across partitionings, unlike the reference's global
    RNG draw order), the forest is Boruvka (spanning_forest machinery) with
    ``minimum=False``. Returns forest edges (src, dst, weight) carrying the
    ORIGINAL weights."""
    from ..functions.dedup import hash60

    u = hash60(
        F.concat_ws(
            ":", F.col("src").cast("string"), F.col("dst").cast("string"),
            F.lit(str(seed)),
        )
    ) / F.lit(float(2 ** 60))
    perturbed = graph.edges.select(
        "src", "dst",
        (F.col("weight") + 1e-6 * (1.0 - 2.0 * u)).alias("weight"),
        F.col("weight").alias("orig_weight"),
    )
    pg = Graph(
        perturbed.select("src", "dst", "weight"),
        directed=False, weighted=True,
    )
    forest = spanning_forest(pg, minimum=False)
    orig = perturbed.select("src", "dst", F.col("orig_weight"))
    return forest.drop("weight").join(orig, ["src", "dst"]).select(
        "src", "dst", F.col("orig_weight").alias("weight")
    )


def union_maximum_spanning_forest(graph: Graph, max_levels: int = 10_000) -> DataFrame:
    """UnionMaximumSpanningForest (reference
    cpp/graph/UnionMaximumSpanningForest.cpp): mark every edge contained in
    AT LEAST ONE maximum-weight spanning forest. Criterion (the reference's
    weight-descending union-find, re-expressed): edge (u, v, w) qualifies iff
    u and v are NOT connected using only edges of weight STRICTLY greater
    than w.

    Distributed plan: one pass per DISTINCT weight level, descending,
    maintaining component labels of the strictly-heavier subgraph. Each level
    (a) marks its edges by comparing endpoint labels, then (b) merges on the
    CONTRACTED component graph (level edges mapped to component-id pairs) —
    the min-label fixpoint runs over component ids, not nodes, so per-level
    work is proportional to the number of merging components, and node labels
    are updated with one mapping join. Level count = |distinct weights| —
    bounded for multiplicity/score weights; when the cardinality exceeds
    ``max_levels`` (continuous weights at web scale), weights are
    automatically quantized into ``max_levels`` equi-width buckets before the
    level loop, so both the driver-side level list and the round count stay
    bounded. The quantized run is an approximation: edges whose weights fall
    in the same bucket are treated as equal (a superset of the exact UMSF is
    marked); the returned ``weight`` column is always the ORIGINAL weight.

    Returns (src, dst, weight, in_umsf:boolean).
    """
    edges = graph.edges
    if edges.select("weight").distinct().limit(max_levels + 1).count() > max_levels:
        lo, hi = edges.agg(F.min("weight"), F.max("weight")).first()
        width = (float(hi) - float(lo)) / max_levels or 1.0
        edges = edges.withColumnRenamed("weight", "_orig_w").withColumn(
            "weight",
            F.least(
                F.floor((F.col("_orig_w") - F.lit(float(lo))) / F.lit(width)),
                F.lit(max_levels - 1),
            ).cast("double"),
        )
    else:
        edges = edges.withColumn("_orig_w", F.col("weight"))
    levels = [
        r["weight"]
        for r in edges.select("weight").distinct().orderBy(F.desc("weight")).collect()
    ]
    labels = (
        graph.nodes()
        .select("node", F.col("node").alias("component"))
        .transform(_cc)
    )
    marked = None
    for w in levels:
        lu = labels.select(F.col("node").alias("src"), F.col("component").alias("cu"))
        lv = labels.select(F.col("node").alias("dst"), F.col("component").alias("cv"))
        lvl = (
            edges.filter(F.col("weight") == w)
            .join(lu, "src")
            .join(lv, "dst")
            .select("src", "dst", "_orig_w", "cu", "cv")
            .transform(_cc)
        )
        out = lvl.select(
            "src",
            "dst",
            F.col("_orig_w").alias("weight"),
            (F.col("cu") != F.col("cv")).alias("in_umsf"),
        )
        marked = out if marked is None else marked.unionByName(out)
        # contracted merge: min-label fixpoint over component ids
        ce = (
            lvl.filter(F.col("cu") != F.col("cv"))
            .select(F.col("cu").alias("a"), F.col("cv").alias("b"))
        )
        ce = ce.unionByName(ce.select(F.col("b").alias("a"), F.col("a").alias("b")))
        ce = ce.distinct().transform(_cc)
        if ce.isEmpty():
            continue
        cmap = (
            ce.select(F.col("a").alias("c"))
            .distinct()
            .select("c", F.col("c").alias("m"))
            .transform(_cc)
        )
        while True:
            nbr = (
                ce.join(cmap.select(F.col("c").alias("a"), F.col("m").alias("nm")), "a")
                .groupBy(F.col("b").alias("c"))
                .agg(F.min("nm").alias("nm"))
            )
            new = cmap.join(nbr, "c", "left").select(
                "c", F.least("m", F.coalesce("nm", F.col("m"))).alias("m")
            )
            # pointer jumping on the contracted map
            new = (
                new.alias("x")
                .join(
                    new.select(F.col("c").alias("m"), F.col("m").alias("mm")).alias("y"),
                    "m",
                    "left",
                )
                .select("c", F.coalesce("mm", F.col("m")).alias("m"))
                .transform(_cc)
            )
            changed = (
                new.join(cmap.withColumnRenamed("m", "old"), "c")
                .filter(F.col("m") != F.col("old"))
                .count()
            )
            cmap = new
            if changed == 0:
                break
        labels = (
            labels.join(cmap.withColumnRenamed("c", "component"), "component", "left")
            .select("node", F.coalesce("m", F.col("component")).alias("component"))
            .transform(_cc)
        )
    if marked is None:
        return graph.edges.select("src", "dst", "weight", F.lit(False).alias("in_umsf"))
    return marked


def random_spanning_forest(
    graph: Graph,
    seed: int = 42,
    max_rounds: int = 10_000,
    stats: dict | None = None,
) -> DataFrame:
    """UNIFORM random spanning forest — reference
    cpp/graph/RandomSpanningForest.cpp:20-49 (Wilson's loop-erased random
    walks) — via the Propp-Wilson CYCLE-POPPING formulation of the same
    algorithm (Propp & Wilson 1998, *How to get a perfectly random sample
    from a generic Markov chain...*), which distributes where the walk does
    not: every non-root node holds an i.i.d. stack of uniform-neighbor
    arrows; repeatedly pop ALL directed cycles of the current arrow graph
    (advance the stack of every on-cycle node) until the arrows form a
    forest rooted at each component's root. The popping theorem makes the
    result independent of pop order and distributed exactly as Wilson's
    tree — uniform over spanning trees per component.

    Spark formulation, per round: (1) arrows from the per-node stack index
    k via element_at(sorted nbrs, hash60(node,k,seed) % deg) — the stack is
    a deterministic hash sequence, so arrows are reproducible and
    partitioning-independent; (2) on-cycle nodes = image of arrow^(2^K)
    (K = ceil(log2 n) pointer-doubling squarings — every walk of length n
    lands on its terminal cycle or root, and cycle nodes are exactly the
    non-root image); (3) bump k on every on-cycle node. Cycles in a
    functional graph are vertex-disjoint, so popping them all at once is a
    valid pop order. Roots: each component's MIN node id.

    Deviations from the reference, documented: the walk randomness is the
    md5-based hash60 sequence, not a host RNG (hash60 % deg carries a
    ≤ deg/2^60 modulo bias — immaterial); roots are deterministic min-ids
    (the reference picks arbitrary unvisited walk starts; the tree
    DISTRIBUTION is root-independent for uniform spanning trees). Returns
    forest edges (src, dst) canonical src < dst.

    Round-count expectation (the weak-at-scale dimension, round-4 verdict):
    the TOTAL number of stack pops equals Wilson's total walk length, whose
    expectation is a sum of mean hitting times — O(m · h) in the worst case
    but near-linear on expander-like graphs. The parallel ROUND count is
    the longest chain in the pop partial order, empirically modest on
    web-like graphs (sf0.01 lineitem: 28 rounds for 14.8k nodes, with the
    per-round cycle count plateauing around 30-70 before collapsing —
    recorded in ``stats``/BENCH/supersteps.json) but data-dependent and
    unbounded in theory, hence ``max_rounds`` fails loudly. Each round
    costs ceil(log2 n) pointer-doubling self-joins. NO early exit on a
    non-shrinking cycle count is possible: the popping theorem guarantees
    termination but says nothing monotone per round (cycle counts can
    plateau while stacks advance), and returning with cycles left would
    not be a spanning forest at all, let alone a uniform one. ``stats``
    records ``rounds`` and the per-round on-cycle node counts
    (``cycle_nodes``).
    """
    from ..functions.dedup import hash60
    from .components import connected_components

    sym = (
        graph.sym()
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    adj = _cc(
        sym.groupBy("src")
        .agg(F.array_sort(F.collect_list("dst")).alias("nbrs"))
        .select(F.col("src").alias("node"), "nbrs", F.size("nbrs").alias("deg"))
    )
    n = graph.num_nodes()
    if n == 0:
        return graph.edges.sparkSession.createDataFrame([], "src long, dst long")
    roots = (
        connected_components(graph)
        .groupBy("component")
        .agg(F.min("node").alias("node"))
        .select("node", F.lit(True).alias("is_root"))
    )
    state = _cc(
        adj.join(roots, "node", "left")
        .select(
            "node",
            "nbrs",
            "deg",
            F.coalesce("is_root", F.lit(False)).alias("is_root"),
            F.lit(0).alias("k"),
        )
    )
    doubling_rounds = max(1, math.ceil(math.log2(max(2, n))))
    for _ in range(max_rounds):
        arrows = _cc(
            state.select(
                "node",
                "is_root",
                F.when(F.col("is_root"), F.col("node"))
                .otherwise(
                    F.element_at(
                        "nbrs",
                        (
                            hash60(
                                F.concat_ws(
                                    ":",
                                    F.col("node").cast("string"),
                                    F.col("k").cast("string"),
                                    F.lit(str(seed)),
                                )
                            )
                            % F.col("deg")
                        ).cast("int")
                        + F.lit(1),
                    )
                )
                .alias("to"),
            )
        )
        # pointer doubling: ptr = arrow^(2^i); roots are absorbing
        ptr = arrows.select("node", F.col("to").alias("ptr"))
        for _i in range(doubling_rounds):
            ptr = _cc(
                ptr.alias("a")
                .join(
                    ptr.alias("b").select(
                        F.col("node").alias("ptr"), F.col("ptr").alias("p2")
                    ),
                    "ptr",
                )
                .select("node", F.col("p2").alias("ptr"))
            )
        on_cycle = (
            ptr.select(F.col("ptr").alias("node"))
            .distinct()
            .join(arrows.filter("is_root").select("node"), "node", "left_anti")
        )
        n_cyc = on_cycle.count()
        if stats is not None:
            stats.setdefault("cycle_nodes", []).append(n_cyc)
            stats["rounds"] = stats.get("rounds", 0) + 1
        if n_cyc == 0:
            edges = arrows.filter(~F.col("is_root")).select(
                F.least("node", "to").alias("src"),
                F.greatest("node", "to").alias("dst"),
            )
            return edges
        state = _cc(
            state.join(on_cycle.withColumn("bump", F.lit(1)), "node", "left")
            .select(
                "node",
                "nbrs",
                "deg",
                "is_root",
                (F.col("k") + F.coalesce("bump", F.lit(0))).alias("k"),
            )
        )
    raise RuntimeError(
        f"random_spanning_forest: cycle popping did not converge in "
        f"{max_rounds} rounds"
    )
