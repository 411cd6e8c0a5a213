"""PageRank — power iteration, reference semantics.

Reference: /root/reference/networkit/cpp/centrality/PageRank.{h,cpp} (77 LoC);
Python wrapper default tol=1e-9 (_NetworKit.pyx:5877).

Pinned semantics (PageRank.cpp):
- gather over IN-edges: pr'[u] = damp * Σ_{v→u} pr[v] * w(v,u) / wdeg(v)
  + (1-damp)/n   (.cpp:35-46); wdeg = weighted OUT degree (.cpp:30-33)
- init uniform 1/n (.cpp:24-26)
- convergence on L2 norm sqrt(Σ (old-new)^2) <= tol (.cpp:48-55)
- final normalization to sum 1 (.cpp:61-68)
- NO dangling redistribution — dangling mass is lost per iteration and only
  restored by the final normalization (.cpp:37-46 has no dangling term).

Spark plan per superstep (declarative; Catalyst chooses hash joins, AQE
coalesces the reduce):
  contribs = transition ⋈ ranks ON src == node   (transition pre-partitioned
             by src and cached → only the small rank vector shuffles)
  sums     = contribs.groupBy(dst).sum(p * score)   (map-side partial agg)
  ranks'   = nodes ⟕ sums → damp*sum + (1-damp)/n
Lineage is truncated each superstep via localCheckpoint (plans/iterate.py).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.iterate import SuperstepDriver


def _transition(graph: Graph, num_partitions: Optional[int] = None) -> DataFrame:
    """Edge transition matrix rows ``(src, dst, p)`` with
    ``p = w(src,dst)/wdeg(src)``, pre-partitioned by src and cached: the
    adjacency never re-shuffles across supersteps — only the rank vector does.

    ``num_partitions`` defaults to the session's default parallelism so the
    scale-safe layout is the DEFAULT: above the rank-broadcast threshold the
    superstep hash-join on src reuses this partitioning and only the O(n)
    rank vector moves. Pass an explicit value to size for cluster memory.
    """
    if num_partitions is None:
        num_partitions = graph.edges.sparkSession.sparkContext.defaultParallelism
    out = graph.sym()
    wdeg = out.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    trans = (
        out.join(wdeg, "src")
        .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("p"))
    )
    if num_partitions:
        trans = trans.repartition(num_partitions, "src")
    return trans


def pagerank(
    graph: Graph,
    damp: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
    fixed_iters: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    num_partitions: Optional[int] = None,
    broadcast_threshold: int = 2_000_000,
    init_scores: Optional[DataFrame] = None,
) -> DataFrame:
    """Returns (node, score) normalized to sum 1.

    ``init_scores`` warm-starts the power iteration from a prior (node,
    score) vector (streaming.DynPageRank passes the pre-event answer):
    scores are aligned to the CURRENT node set — new nodes get the uniform
    mass, departed nodes drop — and renormalized to sum 1, so a small graph
    perturbation converges in a few supersteps instead of a cold start's
    full geometric decay.

    ``checkpoint_dir`` + ``resume=True`` restarts from the latest durable
    manifest written by plans/iterate.py (north_rule resumability); a fresh
    run ignores any stale checkpoint unless ``resume`` is set.

    ``fixed_iters`` runs exactly that many supersteps with no convergence
    collect (oracle-parity + benchmarking mode); otherwise iterate until the
    L2 residual <= tol, one scalar collect per superstep.

    Physical plan: the cached transition edges NEVER reshuffle. When the rank
    vector is small (n <= broadcast_threshold) it broadcasts into a map-side
    join, so a superstep is scan + broadcast-join + partial agg + one
    n-row shuffle. Above the threshold both sides hash-join on src — the
    adjacency side pre-partitioned once via ``num_partitions``.
    """
    n = graph.num_nodes()
    nodes = graph.nodes().persist()
    trans = _transition(graph, num_partitions).persist()
    trans.count()  # materialize the cached adjacency once
    bcast = (lambda df: F.broadcast(df)) if n <= broadcast_threshold else (lambda df: df)

    teleport = (1.0 - damp) / n
    if init_scores is not None:
        aligned = nodes.join(init_scores.select("node", "score"), "node", "left")
        total0 = aligned.agg(F.sum("score")).collect()[0][0] or 1.0
        init = aligned.select(
            "node",
            (F.coalesce("score", F.lit(total0 / n)) / F.lit(total0)).alias("score"),
        ).localCheckpoint(eager=True)
        # renormalize exactly after the fill (the fill itself shifts the sum)
        t1 = init.agg(F.sum("score")).collect()[0][0] or 1.0
        init = init.select("node", (F.col("score") / F.lit(t1)).alias("score"))
    else:
        init = nodes.select("node", F.lit(1.0 / n).alias("score"))

    def step(ranks: DataFrame, i: int):
        sums = (
            trans.join(bcast(ranks), trans.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("score")).alias("mass"))
        )
        new = nodes.join(bcast(sums), nodes.node == sums.dst, "left").select(
            "node",
            (F.lit(damp) * F.coalesce("mass", F.lit(0.0)) + F.lit(teleport)).alias(
                "score"
            ),
        )
        # materialize HERE, exactly once: the residual collect below would
        # otherwise execute the full superstep plan and the driver's eager
        # checkpoint would then recompute the identical plan a second time
        new = new.localCheckpoint(eager=True)
        if fixed_iters is not None:
            return new, None
        # L2 residual — single scalar agg job per superstep, over the
        # already-materialized state
        resid = (
            new.alias("a")
            .join(ranks.alias("b"), "node")
            .agg(F.sum(F.pow(F.col("a.score") - F.col("b.score"), 2)).alias("s"))
            .collect()[0]["s"]
        )
        return new, math.sqrt(resid or 0.0)

    driver = SuperstepDriver(
        tol=tol,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        use_local_checkpoint=False,  # step() checkpoints before its collect
    )
    resume_state = driver.try_resume(graph.edges.sparkSession) if resume else None
    state = driver.run(init, step, resume=resume_state)
    trans.unpersist()
    nodes.unpersist()
    result = state.df
    total = result.agg(F.sum("score").alias("t")).collect()[0]["t"]
    out = result.select("node", (F.col("score") / F.lit(total)).alias("score"))
    out._iterations = state.iteration  # introspection for benches
    out._metrics = state.metrics
    return out


def katz_centrality(
    graph: Graph,
    alpha: float = 5e-4,
    beta: float = 0.1,
    tol: float = 1e-8,
    max_iter: int = 200,
    fixed_iters: Optional[int] = None,
) -> DataFrame:
    """Katz: x ← α·Aᵀx + β, L2-normalized at the end
    (reference cpp/centrality/KatzCentrality.cpp:31-59 — converges when the
    score-vector length stabilizes)."""
    nodes = graph.nodes()
    inedges = graph.sym()  # gather over in-neighbors (undirected: same set)
    init = nodes.select("node", F.lit(0.0).alias("score"))

    def step(x: DataFrame, i: int):
        sums = (
            inedges.join(x, inedges.src == x.node)
            .groupBy("dst")
            .agg(F.sum(F.col("weight") * F.col("score")).alias("mass"))
        )
        new = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            (F.lit(alpha) * F.coalesce("mass", F.lit(0.0)) + F.lit(beta)).alias("score"),
        )
        new = new.localCheckpoint(eager=True)  # once, before the collect
        if fixed_iters is not None:
            return new, None
        resid = (
            new.alias("a")
            .join(x.alias("b"), "node")
            .agg(F.sum(F.abs(F.col("a.score") - F.col("b.score"))).alias("s"))
            .collect()[0]["s"]
        )
        return new, resid or 0.0

    driver = SuperstepDriver(
        tol=tol,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        use_local_checkpoint=False,
    )
    state = driver.run(init, step)
    norm = state.df.agg(F.sqrt(F.sum(F.pow("score", 2))).alias("n")).collect()[0]["n"]
    return state.df.select("node", (F.col("score") / F.lit(norm)).alias("score"))


def eigenvector_centrality(
    graph: Graph,
    tol: float = 1e-9,
    max_iter: int = 200,
    fixed_iters: Optional[int] = None,
) -> DataFrame:
    """Power iteration with L2 normalization each step
    (reference cpp/centrality/EigenvectorCentrality.cpp, 80 LoC)."""
    n = graph.num_nodes()
    nodes = graph.nodes()
    inedges = graph.sym()
    init = nodes.select("node", F.lit(1.0 / math.sqrt(n)).alias("score"))

    def step(x: DataFrame, i: int):
        sums = (
            inedges.join(x, inedges.src == x.node)
            .groupBy("dst")
            .agg(F.sum(F.col("weight") * F.col("score")).alias("mass"))
        )
        new = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node", F.coalesce("mass", F.lit(0.0)).alias("score")
        )
        # one materialization per superstep: norm collect, residual collect,
        # and the next iteration all read the checkpointed blocks
        new = new.localCheckpoint(eager=True)
        norm_row = new.agg(F.sqrt(F.sum(F.pow("score", 2))).alias("nrm")).collect()[0]
        nrm = norm_row["nrm"] or 1.0
        new = new.select("node", (F.col("score") / F.lit(nrm)).alias("score"))
        if fixed_iters is not None:
            return new, None
        resid = (
            new.alias("a")
            .join(x.alias("b"), "node")
            .agg(F.sqrt(F.sum(F.pow(F.col("a.score") - F.col("b.score"), 2))).alias("s"))
            .collect()[0]["s"]
        )
        return new, resid or 0.0

    driver = SuperstepDriver(
        tol=tol,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        use_local_checkpoint=False,
    )
    state = driver.run(init, step)
    return state.df
