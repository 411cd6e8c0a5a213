"""PLM — parallel Louvain method (multilevel modularity optimization).

Reference: /root/reference/networkit/cpp/community/PLM.cpp:29-250 (347 LoC):
move phase (modularity delta from community volumes + intra weights,
PLM.cpp:42-120), coarsening via ParallelPartitionCoarsening, recursion,
projection back (ClusteringProjector), optional refinement.

Spark formulation (synchronous local-move supersteps):
- per superstep, every node evaluates moving to each neighbor community:
    Δmod(u → C) = (w(u,C) − w(u,C_u∖u)) / m
                  − γ·deg(u)·(vol(C) − vol(C_u∖u)) / (2m²)
  computed relationally: edges ⋈ labels → per-(node, community) weights,
  joined with broadcast community volumes; argmax with deterministic
  (Δ, community) tie-break. Synchronous moves can ping-pong, so sweeps
  alternate by move DIRECTION: even sweeps admit only moves to a smaller
  community id, odd sweeps only to a larger one — a swap would need one of
  each in the same sweep, so pairwise oscillation is impossible
  (deterministic, partition-independent; node-id parity would NOT prevent
  two same-parity neighbors from trading communities).
- when a full even+odd cycle moves < θ nodes, contract (coarsen) and
  recurse; project labels back down at the end.

The result is a proper deterministic clustering in the spirit of parallel
Louvain: individually-improving synchronized moves (concurrent moves into
the same community use pre-move volumes, as every parallel Louvain does),
guarded against pairwise oscillation — matching PLM's semantics, not its
(nondeterministic, schedule-dependent) exact labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc
from .community import coarsen as contract_graph


def _move_phase(
    graph: Graph, gamma: float, max_sweeps: int, theta: int
) -> DataFrame:
    """Local-move phase on one level; returns (node, label)."""
    m = graph.total_edge_weight()
    if m == 0:
        return graph.nodes().select("node", F.col("node").alias("label"))
    sym = graph.sym().persist()
    # volNode = weightedDegree + selfLoopWeight (PLM.cpp:47-51 — the self
    # loop is counted TWICE in the volume; sym()/weighted_degrees count it
    # once, so add it once more)
    selfw = (
        graph.edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("weight").alias("sw"))
    )
    wdeg = (
        graph.weighted_degrees()
        .join(selfw, "node", "left")
        .select(
            "node",
            (F.col("wdeg") + F.coalesce("sw", F.lit(0.0))).alias("wdeg"),
        )
        .persist()
    )
    n = wdeg.count()
    bcast = (lambda d: F.broadcast(d)) if n <= 2_000_000 else (lambda d: d)
    # stats-clean checkpoints (plans/ckpt.py): labels-derived frames enter
    # each sweep's join tree ~4 times (vols ×2, lbl_dst, cur), so plain
    # localCheckpoint's propagated sizeInBytes is raised to the ~4th power
    # per sweep — Catalyst planning degenerates into million-bit BigInteger
    # products within ~6 sweeps at sf0.1 (same pathology as flow/matching).
    labels = _cc(graph.nodes().select("node", F.col("node").alias("label")))
    cycle_moved = 0
    for sweep in range(max_sweeps):
        vols = (
            labels.join(wdeg, "node").groupBy("label").agg(F.sum("wdeg").alias("vol"))
        )
        lbl_dst = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
        # w(u, C) for all neighbor communities C of u (incl. own), self-loop
        # EXCLUDED (PLM.cpp:95-117 affinity skips u == v: the loop stays
        # with u under any move, so counting it would understate every
        # leave-own gain by selfloop/m — coarsening turns all intra weight
        # into self-loops, so every level >= 2 would under-merge)
        w_uc = (
            sym.filter(F.col("src") != F.col("dst"))
            .join(bcast(lbl_dst), "dst")
            .groupBy(F.col("src").alias("node"), F.col("ldst").alias("cand"))
            .agg(F.sum("weight").alias("w_uc"))
        )
        cur = labels.withColumnRenamed("label", "own")
        j = (
            w_uc.join(bcast(cur), "node")
            .join(bcast(wdeg), "node")
            .join(bcast(vols.withColumnRenamed("label", "cand").withColumnRenamed("vol", "vol_cand")), "cand")
            .join(bcast(vols.withColumnRenamed("label", "own").withColumnRenamed("vol", "vol_own")), "own")
        )
        w_own = F.coalesce(
            F.max(F.when(F.col("cand") == F.col("own"), F.col("w_uc"))).over(
                Window.partitionBy("node")
            ),
            F.lit(0.0),
        )
        j = j.withColumn("w_own", w_own)
        delta = (
            (F.col("w_uc") - F.col("w_own")) / m
            - F.lit(gamma) * F.col("wdeg")
            * (F.col("vol_cand") - (F.col("vol_own") - F.col("wdeg")))
            / F.lit(2.0 * m * m)
        )
        # candidate == own has delta ~ -gamma*wdeg*(wdeg)/2m² ≥ own-stay value 0;
        # normalize: staying = delta 0
        delta = F.when(F.col("cand") == F.col("own"), F.lit(0.0)).otherwise(delta)
        best = (
            j.select("node", "cand", delta.alias("d"))
            .groupBy("node")
            .agg(F.max(F.struct(F.col("d"), (-F.col("cand")).alias("nc"))).alias("mx"))
            .select(
                "node",
                F.col("mx.d").alias("d"),
                (-F.col("mx.nc")).alias("best"),
            )
        )
        # DIRECTION-parity schedule: even sweeps allow only moves to a
        # SMALLER community id, odd sweeps only to a larger one. A
        # synchronous swap needs u -> C_v and v -> C_u in one sweep, which
        # always involves one downhill and one uphill move — so no swap can
        # ever happen (node-id parity did NOT guarantee this: two adjacent
        # even nodes could still trade communities). Deterministic,
        # partition-independent, and every node is eligible each sweep.
        direction = (
            (F.col("best") < F.col("label"))
            if sweep % 2 == 0
            else (F.col("best") > F.col("label"))
        )
        new = (
            labels.join(bcast(best), "node", "left")
            .select(
                "node",
                F.when((F.col("d") > 1e-15) & direction, F.col("best"))
                .otherwise(F.col("label"))
                .alias("label"),
            )
            .transform(_cc)
        )
        moved = (
            new.alias("a").join(labels.alias("b"), "node")
            .filter(F.col("a.label") != F.col("b.label")).count()
        )
        labels = new
        # converge on a FULL even+odd cycle: a single direction class with
        # no improving moves must not freeze the other class's pending ones
        cycle_moved = moved if sweep % 2 == 0 else cycle_moved + moved
        if sweep % 2 == 1 and cycle_moved <= theta:
            break
    sym.unpersist()
    wdeg.unpersist()
    return labels


def plm(
    graph: Graph,
    gamma: float = 1.0,
    max_levels: int = 10,
    max_sweeps: int = 10,
    theta: int = 0,
) -> DataFrame:
    """Multilevel Louvain; returns (node, label) with labels canonicalized to
    the min member node id (deterministic representation)."""
    level_labels: list[DataFrame] = []
    g = graph
    for level in range(max_levels):
        labels = _move_phase(g, gamma, max_sweeps, theta)
        k = labels.select("label").distinct().count()
        n = labels.count()
        level_labels.append(labels)
        if k == n or k <= 1:
            break
        g = contract_graph(g, labels)
    # project back: compose mappings top-down
    final = level_labels[0]
    for labels in level_labels[1:]:
        upper = labels.select(
            F.col("node").alias("label"), F.col("label").alias("newlabel")
        )
        final = (
            final.join(upper, "label", "left")
            .select("node", F.coalesce("newlabel", "label").alias("label"))
        )
    # canonicalize to min member id
    rep = final.groupBy("label").agg(F.min("node").alias("rep"))
    return final.join(rep, "label").select("node", F.col("rep").alias("label"))
