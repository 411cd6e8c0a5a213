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
        # step owns the (stats-clean) truncation in BOTH modes — the driver
        # is constructed with use_local_checkpoint=False, so the adaptive
        # path's changed-count runs over the already-cached frame and the
        # driver does not re-materialize it (was a second checkpoint job
        # per round)
        new = _cc(new)
        if fixed_iters is not None:
            return new, None
        changed = new.filter("changed").count()
        return new, float(changed)

    # step() already checkpoints with clean_local_checkpoint (stats-clean:
    # the pointer-jumping step joins the state against itself, so plain
    # checkpoint stats would square per round) — driver must not truncate
    # again.
    driver = SuperstepDriver(
        tol=0.0,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        checkpoint_dir=checkpoint_dir,
        use_local_checkpoint=False,
    )
    state = driver.run(init, step)
    sym.unpersist()
    nodes.unpersist()
    out = state.df.select("node", "component")
    out._iterations = state.iteration
    return out


def strongly_connected_components(
    graph: Graph,
    max_outer: int = 100,
    trim_rounds: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) on a DIRECTED graph; component = MIN member id of the
    SCC (deterministic canonical labels — the reference's
    StronglyConnectedComponents.cpp:33-164 iterative Tarjan emits
    discovery-order ids; canonicalize both to min-member to compare).

    Distributed trim + min-coloring + backward min-label (the FW-BW-Trim
    family — sequential Tarjan does not distribute), with SHORTCUT DOUBLING
    on both label loops so each fixpoint converges in ~log(diameter) rounds
    instead of O(diameter):
      1. TRIM (capped at ``trim_rounds`` per outer pass): a node with in-
         or out-degree 0 inside the remaining subgraph is its own SCC —
         peels the tendril bulk of web graphs in the first couple of
         rounds; deeper chains resolve through the label loops instead of
         paying one round-trip per chain link.
      2. COLOR: ``color[v] = min(v, color of in-neighbors,
         color[color[v]])`` to fixpoint — the third term is pointer
         jumping on the best-known-ancestor pointer (color[v] reaches v and
         color[color[v]] reaches color[v], so the composite is a valid
         ancestor), collapsing long witness paths by doubling. Fixpoint:
         color[v] = min node id that reaches v.
      3. BACKWARD MIN on the color-homogeneous edge set (edges whose
         endpoints share a color — any v→root path lies entirely inside
         root's SCC, hence inside one color region): ``bmin[v] = min(v,
         bmin of out-neighbors, bmin[bmin[v]])``, same doubling. Fixpoint:
         bmin[v] = min id v reaches inside its region — which is the
         region's root r iff v ∈ SCC(r) (r is the min id of its region:
         a smaller-id region member would be its own ancestor and force
         color[r] < r).
      4. Resolved = every v with ``bmin[v] == color[v]`` (component =
         color). This resolves at least all source-SCCs of the remaining
         condensation per outer pass, so outer rounds are bounded by the
         condensation's level depth — same bound as the sweep formulation,
         but each inner loop is now logarithmic.

    Every superstep is a join + groupBy — the same shuffle shape as
    connected_components; nothing is collected to the driver except
    per-round convergence counters.
    """
    if not graph.directed:
        return connected_components(graph)
    edges_all = graph.edges.select("src", "dst").distinct().persist()
    edges_all.count()
    remaining = _cc(graph.nodes().select("node"))
    done: DataFrame | None = None
    counters = {"outer": 0, "trim": 0, "color": 0, "bmin": 0}

    def _accum(acc, part):
        part = part.select("node", F.col("component").cast("long").alias("component"))
        return part if acc is None else acc.unionByName(part).transform(_cc)

    for _ in range(max_outer):
        if remaining.isEmpty():
            break
        counters["outer"] += 1
        # -- 1. capped trim loop --------------------------------------------
        for _t in range(trim_rounds):
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
            counters["trim"] += 1
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
            .filter(F.col("src") != F.col("dst"))
            .transform(_cc)
        )
        # -- 2. forward min-color with shortcut doubling ---------------------
        color = remaining.select("node", F.col("node").alias("color")).localCheckpoint(
            eager=True
        )
        while True:
            nbr = (
                e.join(color.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"), "color")
            )
            jump = (
                color.join(
                    color.select(
                        F.col("node").alias("color"), F.col("color").alias("c2")
                    ),
                    "color",
                )
                .select("node", F.col("c2").alias("color"))
            )
            new = (
                color.unionByName(nbr)
                .unionByName(jump)
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
            counters["color"] += 1
            if changed == 0:
                break
        # -- 3. backward min on color-homogeneous edges, same doubling -------
        ec = (
            e.join(color.withColumnRenamed("node", "src")
                   .withColumnRenamed("color", "c_src"), "src")
            .join(color.withColumnRenamed("node", "dst")
                  .withColumnRenamed("color", "c_dst"), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .transform(_cc)
        )
        bmin = remaining.select("node", F.col("node").alias("bmin")).localCheckpoint(
            eager=True
        )
        while True:
            nbr = (
                ec.join(bmin.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), "bmin")
            )
            jump = (
                bmin.join(
                    bmin.select(
                        F.col("node").alias("bmin"), F.col("bmin").alias("b2")
                    ),
                    "bmin",
                )
                .select("node", F.col("b2").alias("bmin"))
            )
            new = (
                bmin.unionByName(nbr)
                .unionByName(jump)
                .groupBy("node")
                .agg(F.min("bmin").alias("bmin"))
                .transform(_cc)
            )
            changed = (
                new.alias("a")
                .join(bmin.alias("b"), "node")
                .filter(F.col("a.bmin") != F.col("b.bmin"))
                .count()
            )
            bmin = new
            counters["bmin"] += 1
            if changed == 0:
                break
        # -- 4. resolve SCCs whose backward min hits their region root -------
        visited = (
            color.join(bmin, "node")
            .filter(F.col("bmin") == F.col("color"))
            .select("node", F.col("color").alias("component"))
            .transform(_cc)
        )
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
    if stats is not None:
        stats.update(counters)
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
