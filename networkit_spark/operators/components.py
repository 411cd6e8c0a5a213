"""Connected components — iterative hash-to-min label propagation.

Reference: /root/reference/networkit/cpp/components/
ParallelConnectedComponents.cpp:20-95 (min-label propagation with an
active-node frontier, optional coarsening after 8 iterations). The fixpoint
label of every node is the MIN node id of its component — deterministic
regardless of schedule, which is what makes exact-match testing possible
(the BFS variant ConnectedComponents.cpp:32-35 emits discovery-order ids;
canonicalize both sides to min-member labels to compare).

Spark plan: label[v] ← min(label[v], min over neighbors). Plain propagation
converges in O(diameter) supersteps; ``pointer_jumping=True`` adds a
label-of-label shortcut step each round (label[v] ← label[label[v]]), the
distributed pointer-doubling trick that converges in O(log n) rounds on
high-diameter graphs — essential at web scale where crawl chains are deep.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc
from ..plans.iterate import SuperstepDriver


def connected_components(
    graph: Graph,
    max_iter: int = 100,
    fixed_iters: Optional[int] = None,
    pointer_jumping: bool = True,
    checkpoint_dir: Optional[str] = None,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """Returns (node, component) with component = min node id in component.

    Active-set frontier (ParallelConnectedComponents.cpp:41-42,67-74): only
    labels that CHANGED last round propagate — a node's min can only improve
    via a neighbor whose label just dropped (labels are monotone decreasing,
    and an unchanged label was already sent the round it last changed). Late
    rounds therefore shuffle only the frontier's edges, not all m — on web
    graphs the frontier collapses to the few deep chains after ~3 rounds.

    Directed graphs are symmetrized first (WEAKLY connected components —
    the reference's ConnectedComponents likewise expects an undirected
    graph and offers WeaklyConnectedComponents for directed ones). Without
    this, propagation would run src→dst only and converge to "min id that
    REACHES v", which is neither weak nor strong components.
    """
    if graph.directed:
        graph = graph.to_undirected()
    nodes = graph.nodes().persist()
    sym = graph.sym_part().persist()
    sym.count()
    n = nodes.count()
    bcast = (lambda d: F.broadcast(d)) if n <= broadcast_threshold else (lambda d: d)
    # state carries the frontier flag: (node, component, changed)
    init = nodes.select(
        "node", F.col("node").alias("component"), F.lit(True).alias("changed")
    )

    def step(state: DataFrame, i: int):
        frontier = state.filter("changed").select("node", "component")
        nbr_min = (
            sym.join(bcast(frontier), sym.src == frontier.node)
            .groupBy("dst")
            .agg(F.min("component").alias("nc"))
            .select(F.col("dst").alias("node"), "nc")
        )
        new = state.select("node", "component").join(nbr_min, "node", "left").select(
            "node",
            F.col("component").alias("old"),
            F.least("component", F.coalesce("nc", "component")).alias("component"),
        )
        if pointer_jumping:
            # label[v] ← label[label[v]]: treat the label as a parent pointer
            parents = new.select(
                F.col("node").alias("pnode"), F.col("component").alias("pcomp")
            )
            new = (
                new.join(bcast(parents), new.component == parents.pnode, "left")
                .select(
                    "node",
                    "old",
                    F.coalesce("pcomp", "component").alias("component"),
                )
            )
        new = new.select(
            "node",
            "component",
            (F.col("component") != F.col("old")).alias("changed"),
        )
        if fixed_iters is not None:
            return new, None
        new = _cc(new)
        changed = new.filter("changed").count()
        return new, float(changed)

    # stats_clean: the pointer-jumping step joins the state against itself
    # (label-of-label), so plain checkpoint stats would square per round.
    driver = SuperstepDriver(
        tol=0.0,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        checkpoint_dir=checkpoint_dir,
        stats_clean=True,
    )
    state = driver.run(init, step)
    sym.unpersist()
    nodes.unpersist()
    out = state.df.select("node", "component")
    out._iterations = state.iteration
    return out


def strongly_connected_components(graph: Graph, max_outer: int = 100) -> DataFrame:
    """(node, component) on a DIRECTED graph; component = MIN member id of the
    SCC (deterministic canonical labels — the reference's
    StronglyConnectedComponents.cpp:33-164 iterative Tarjan emits
    discovery-order ids; canonicalize both to min-member to compare).

    Distributed trim + min-coloring + backward sweep (the FW-BW-Trim family —
    sequential Tarjan does not distribute):
      1. TRIM to fixpoint: a node with in- or out-degree 0 inside the
         remaining subgraph is its own SCC (peels tendrils/chains — on web
         graphs this clears most of the node set in a few rounds).
      2. COLOR: propagate ``color[v] = min(v, color of in-neighbors)`` to
         fixpoint inside the remaining subgraph — color[v] is the min node id
         that reaches v.
      3. SWEEP: every root r (color[r] == r) is the MIN member of its SCC;
         multi-source backward BFS from all roots along in-edges restricted
         to equal color collects each root's SCC in parallel.
      4. Remove resolved SCCs, repeat — each outer round resolves every
         source-SCC of the remaining condensation, so outer rounds are
         bounded by the condensation's level depth.

    Every superstep is a frontier semi-join + groupBy — the same shuffle
    shape as connected_components; nothing is collected to the driver except
    per-round convergence counters.
    """
    if not graph.directed:
        return connected_components(graph)
    edges_all = graph.edges.select("src", "dst").distinct().persist()
    edges_all.count()
    remaining = _cc(graph.nodes().select("node"))
    done: DataFrame | None = None

    def _accum(acc, part):
        part = part.select("node", F.col("component").cast("long").alias("component"))
        return part if acc is None else acc.unionByName(part).transform(_cc)

    for _ in range(max_outer):
        if remaining.isEmpty():
            break
        # -- 1. trim loop ---------------------------------------------------
        while True:
            e = (
                edges_all.join(remaining.withColumnRenamed("node", "src"), "src", "left_semi")
                .join(remaining.withColumnRenamed("node", "dst"), "dst", "left_semi")
                .filter(F.col("src") != F.col("dst"))
            )
            has_out = e.select(F.col("src").alias("node")).distinct()
            has_in = e.select(F.col("dst").alias("node")).distinct()
            keep = (
                remaining.join(has_out, "node", "left_semi")
                .join(has_in, "node", "left_semi")
                .transform(_cc)
            )
            trimmed = remaining.join(keep, "node", "left_anti")
            if trimmed.isEmpty():
                break
            done = _accum(done, trimmed.select("node", F.col("node").alias("component")))
            remaining = keep
        if remaining.isEmpty():
            break
        e = (
            edges_all.join(remaining.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .transform(_cc)
        )
        # -- 2. forward min-color propagation to fixpoint --------------------
        color = remaining.select("node", F.col("node").alias("color")).localCheckpoint(
            eager=True
        )
        while True:
            nbr = (
                e.join(color.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"), "color")
            )
            new = (
                color.unionByName(nbr)
                .groupBy("node")
                .agg(F.min("color").alias("color"))
                .transform(_cc)
            )
            changed = (
                new.alias("a")
                .join(color.alias("b"), "node")
                .filter(F.col("a.color") != F.col("b.color"))
                .count()
            )
            color = new
            if changed == 0:
                break
        # -- 3. backward sweep from roots within equal color -----------------
        visited = (
            color.filter(F.col("color") == F.col("node"))
            .select("node", F.col("node").alias("component"))
            .transform(_cc)
        )
        frontier = visited
        src_color = color.select(F.col("node").alias("src"), F.col("color").alias("c_src"))
        while not frontier.isEmpty():
            cand = (
                e.join(frontier.withColumnRenamed("node", "dst"), "dst")
                .join(src_color, "src")
                .filter(F.col("c_src") == F.col("component"))
                .select(F.col("src").alias("node"), "component")
                .distinct()
            )
            frontier = cand.join(visited, "node", "left_anti").transform(_cc)
            if frontier.isEmpty():
                break
            visited = visited.unionByName(frontier).transform(_cc)
        done = _accum(done, visited)
        remaining = remaining.join(visited, "node", "left_anti").transform(_cc)
    if not remaining.isEmpty():
        edges_all.unpersist()
        # a partial labeling would silently DROP these nodes from downstream
        # joins — fail loudly instead (condensation deeper than max_outer)
        raise RuntimeError(
            "strongly_connected_components: condensation not exhausted "
            f"after {max_outer} outer rounds — raise max_outer"
        )
    edges_all.unpersist()
    if done is None:
        return graph.nodes().select("node", F.col("node").alias("component"))
    return done


def num_components(labels: DataFrame) -> int:
    return labels.select("component").distinct().count()


def component_sizes(labels: DataFrame) -> DataFrame:
    """(component, size) — Partition::subsetSizeMap analog
    (reference cpp/structures/Partition.h:63-84)."""
    return labels.groupBy("component").agg(F.count("*").alias("size"))


def extract_largest_component(graph: Graph, labels: DataFrame | None = None) -> Graph:
    """workflows.py:17-39 extractLargestComponent analog."""
    if labels is None:
        labels = connected_components(graph)
    largest = (
        labels.groupBy("component")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), F.asc("component"))
        .limit(1)
    )
    keep = labels.join(F.broadcast(largest.select("component")), "component").select("node")
    return graph.subgraph_from_nodes(keep)
