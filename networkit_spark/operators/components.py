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
from ..plans.iterate import SuperstepDriver


def connected_components(
    graph: Graph,
    max_iter: int = 100,
    fixed_iters: Optional[int] = None,
    pointer_jumping: bool = True,
    checkpoint_dir: Optional[str] = None,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """Returns (node, component) with component = min node id in component."""
    nodes = graph.nodes().persist()
    sym = graph.sym().select("src", "dst").persist()
    sym.count()
    n = nodes.count()
    bcast = (lambda d: F.broadcast(d)) if n <= broadcast_threshold else (lambda d: d)
    init = nodes.select("node", F.col("node").alias("component"))

    def step(labels: DataFrame, i: int):
        nbr_min = (
            sym.join(bcast(labels), sym.src == labels.node)
            .groupBy("dst")
            .agg(F.min("component").alias("component"))
            .select(F.col("dst").alias("node"), "component")
        )
        new = (
            labels.unionByName(nbr_min)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if pointer_jumping:
            # label[v] ← label[label[v]]: treat the label as a parent pointer
            parents = new.select(
                F.col("node").alias("pnode"), F.col("component").alias("pcomp")
            )
            new = (
                new.join(bcast(parents), new.component == parents.pnode, "left")
                .select("node", F.coalesce("pcomp", "component").alias("component"))
            )
        if fixed_iters is not None:
            return new, None
        changed = (
            new.alias("a")
            .join(labels.alias("b"), "node")
            .filter(F.col("a.component") != F.col("b.component"))
            .count()
        )
        return new, float(changed)

    driver = SuperstepDriver(
        tol=0.0,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        checkpoint_dir=checkpoint_dir,
    )
    state = driver.run(init, step)
    sym.unpersist()
    nodes.unpersist()
    out = state.df
    out._iterations = state.iteration
    return out


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
