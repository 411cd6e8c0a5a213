"""Community detection (PLP) and partition quality measures.

Reference: /root/reference/networkit/cpp/community/PLP.{h,cpp} (141 LoC) —
label propagation: each node adopts the neighbor label with the highest
incident edge weight, ties broken to the SMALLEST label id (PLP.cpp:89-92,
std::max_element over an ordered std::map). The reference sweep is
asynchronous and schedule-dependent (PLP.cpp:77-107); this engine uses a
SYNCHRONOUS (Jacobi) superstep with the same tie-break, which is
deterministic and partition-invariant — required for exact-match oracles
(see SURVEY.md §5 determinism caveat).

Quality measures: Modularity (cpp/community/Modularity.cpp:28-81:
coverage − Σ_C (vol(C)/2m)²), Coverage, EdgeCut, Conductance — all two-pass
``edges ⋈ labels`` aggregations. ParallelPartitionCoarsening
(cpp/coarsening/ParallelPartitionCoarsening.h:20-29) is the label-contraction
groupBy used by PLM-style multilevel schemes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc
from ..plans.iterate import SuperstepDriver


def plp(
    graph: Graph,
    max_iter: int = 100,
    theta: Optional[int] = None,
    fixed_iters: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Synchronous label propagation; returns (node, label).

    Update rule per superstep (PLP.cpp:77-107, synchronized):
      label'[u] = argmax_l Σ_{v∈N(u), label[v]=l} w(u,v), ties → smallest l;
      isolated nodes keep their singleton label (PLP.cpp:50-61).
    Termination: #updated nodes <= theta (default n/1e5, PLP.cpp:41-43) or
    max_iter. Synchronous LP can 2-cycle on bipartite structures, so
    max_iter/fixed_iters is a real bound, not just a safety net.
    """
    nodes = graph.nodes().persist()
    n = nodes.count()
    if theta is None and fixed_iters is None:
        theta = max(int(n / 1e5), 0)
    sym = graph.sym_part(key="dst", cols=("src", "dst", "weight")).persist()
    sym.count()
    bcast = (lambda d: F.broadcast(d)) if n <= 2_000_000 else (lambda d: d)
    labels = nodes.select("node", F.col("node").alias("label")).transform(_cc)

    def superstep(cur: DataFrame) -> DataFrame:
        # weight of each label among u's neighbors (PLP.cpp:80-86)
        nbr = sym.join(bcast(cur), sym.dst == cur.node).select(
            F.col("src").alias("u"), "label", "weight"
        )
        lw = nbr.groupBy("u", "label").agg(F.sum("weight").alias("w"))
        # argmax by (w, -label): heaviest label, ties to smallest id
        best = lw.groupBy("u").agg(
            F.max(F.struct(F.col("w"), (-F.col("label")).alias("nl"))).alias("m")
        ).select("u", (-F.col("m.nl")).alias("best"))
        return cur.join(bcast(best), cur.node == best.u, "left").select(
            "node", F.coalesce("best", "label").alias("label")
        )

    limit = fixed_iters if fixed_iters is not None else max_iter
    prev = None  # labels at t-1 (for period-2 oscillation detection)
    iters = 0
    oscillating = False
    for i in range(limit):
        new = superstep(labels).transform(_cc)
        iters = i + 1
        if fixed_iters is None:
            # one aggregate reads both convergence counters (vs t-1 and,
            # for period-2 oscillation detection, vs t-2) — one cached-side
            # job per round instead of two
            cmp_ = new.alias("a").join(labels.alias("b"), "node")
            if prev is not None:
                cmp_ = cmp_.join(prev.alias("c"), "node")
            row = cmp_.agg(
                F.sum(
                    (F.col("a.label") != F.col("b.label")).cast("long")
                ).alias("d1"),
                *(
                    [
                        F.sum(
                            (F.col("a.label") != F.col("c.label")).cast("long")
                        ).alias("d2")
                    ]
                    if prev is not None
                    else []
                ),
            ).first()
            diff1 = int(row["d1"] or 0)
            if diff1 <= theta:
                labels = new
                break
            if prev is not None:
                diff2 = int(row["d2"] or 0)
                if diff2 <= theta:
                    # period-2 cycle (synchronous LP on bipartite structure):
                    # resolve deterministically to the elementwise min of the
                    # two alternating label vectors (identity on fixpoints)
                    labels = (
                        new.alias("a").join(labels.alias("b"), "node")
                        .select("node", F.least(F.col("a.label"), F.col("b.label")).alias("label"))
                        .transform(_cc)
                    )
                    oscillating = True
                    break
        prev = labels
        labels = new
    out = labels
    out._iterations = iters
    out._oscillation_resolved = oscillating
    sym.unpersist()
    nodes.unpersist()
    return out


def lp_degree_ordered(graph: Graph, max_iter: int = 100) -> DataFrame:
    """LPDegreeOrdered analog (cpp/community/LPDegreeOrdered.{h,cpp}): the
    synchronous engine is order-free, so this is PLP; kept as a named alias
    for API parity."""
    return plp(graph, max_iter=max_iter)


# ---------------------------------------------------------------------------
# partition measures
# ---------------------------------------------------------------------------

def _edge_labels(graph: Graph, labels: DataFrame) -> DataFrame:
    """edges ⋈ labels on both endpoints → (src, dst, weight, lsrc, ldst).
    Labels are broadcast when small; at web scale this is two shuffle joins
    on (src)/(dst) against a co-partitioned label table."""
    l1 = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    l2 = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    return graph.edges.join(l1, "src").join(l2, "dst")


def modularity(graph: Graph, labels: DataFrame) -> float:
    """Modularity.cpp:28-81: coverage − Σ_C (vol(C)/2m)²; vol counts self-
    loops TWICE (``weightedDegree(v) + weight(v,v)``, Modularity.cpp:59 —
    "account for self-loops a second time"); total edge weight counts them
    once; intra-weight includes loops."""
    m = graph.total_edge_weight()
    if m == 0:
        return 0.0
    el = _edge_labels(graph, labels)
    intra = (
        el.filter(F.col("lsrc") == F.col("ldst")).agg(F.sum("weight").alias("w")).collect()[0]["w"]
        or 0.0
    )
    coverage = intra / m
    # volume per community: sum of weighted degrees with self-loops counted
    # TWICE (Modularity.cpp totalEdgeWeight/volume convention, same
    # correction plm.py applies — sym()/weighted_degrees see a loop once,
    # so add its weight once more; coarsened graphs are all self-loops)
    selfw = (
        graph.edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("weight").alias("sw"))
    )
    wdeg = (
        graph.weighted_degrees()
        .join(selfw, "node", "left")
        .select(
            "node", (F.col("wdeg") + F.coalesce("sw", F.lit(0.0))).alias("wdeg")
        )
    )
    vol = (
        labels.join(wdeg, "node")
        .groupBy("label")
        .agg(F.sum("wdeg").alias("vol"))
    )
    sq = vol.agg(F.sum(F.pow(F.col("vol") / (2.0 * m), 2)).alias("s")).collect()[0]["s"] or 0.0
    return coverage - sq


def coverage(graph: Graph, labels: DataFrame) -> float:
    """Coverage.cpp: intra-community edge weight / total edge weight."""
    m = graph.total_edge_weight()
    if m == 0:
        return 0.0
    el = _edge_labels(graph, labels)
    intra = (
        el.filter(F.col("lsrc") == F.col("ldst")).agg(F.sum("weight").alias("w")).collect()[0]["w"]
        or 0.0
    )
    return intra / m


def edge_cut(graph: Graph, labels: DataFrame) -> float:
    """EdgeCut.cpp: total weight of inter-community edges."""
    el = _edge_labels(graph, labels)
    cut = (
        el.filter(F.col("lsrc") != F.col("ldst")).agg(F.sum("weight").alias("w")).collect()[0]["w"]
        or 0.0
    )
    return float(cut)


def conductance(graph: Graph, labels: DataFrame, community: int) -> float:
    """Conductance.cpp: cut(C) / min(vol(C), vol(V∖C))."""
    wdeg = graph.weighted_degrees()
    vols = labels.join(wdeg, "node").groupBy("label").agg(F.sum("wdeg").alias("vol"))
    volc = vols.filter(F.col("label") == community).collect()
    vol_c = float(volc[0]["vol"]) if volc else 0.0
    total = float(vols.agg(F.sum("vol").alias("t")).collect()[0]["t"] or 0.0)
    el = _edge_labels(graph, labels)
    cut = (
        el.filter(
            ((F.col("lsrc") == community) | (F.col("ldst") == community))
            & (F.col("lsrc") != F.col("ldst"))
        )
        .agg(F.sum("weight").alias("w"))
        .collect()[0]["w"]
        or 0.0
    )
    denom = min(vol_c, total - vol_c)
    return float(cut) / denom if denom > 0 else 0.0


def coarsen(graph: Graph, labels: DataFrame) -> Graph:
    """ParallelPartitionCoarsening (cpp/coarsening/ParallelPartitionCoarsening
    .h:20-29): contract communities to super-nodes, summing parallel edge
    weights — one groupBy after the two label joins. Used by CC-coarsening
    (ParallelConnectedComponents.cpp:81-94) and PLM multilevel."""
    el = _edge_labels(graph, labels)
    contracted = (
        el.select(
            F.least("lsrc", "ldst").alias("src") if not graph.directed else F.col("lsrc").alias("src"),
            F.greatest("lsrc", "ldst").alias("dst") if not graph.directed else F.col("ldst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    return Graph(contracted, directed=graph.directed, weighted=True)


def partition_intersection(labels_a: DataFrame, labels_b: DataFrame) -> DataFrame:
    """PartitionIntersection (cpp/community/PartitionIntersection.cpp):
    finest common refinement — relabel by (label_a, label_b) pair."""
    joined = labels_a.withColumnRenamed("label", "la").join(
        labels_b.withColumnRenamed("label", "lb"), "node"
    )
    # deterministic new label: min node id within each (la, lb) cell
    return (
        joined.groupBy("la", "lb")
        .agg(F.min("node").alias("cell"))
        .join(joined, ["la", "lb"])
        .select("node", F.col("cell").alias("label"))
    )


def local_partition_coverage(graph: Graph, labels: DataFrame) -> DataFrame:
    """LocalPartitionCoverage.cpp:43 — per node, fraction of neighbors in the
    same partition."""
    lab_u = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    lab_v = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    nb = graph.sym().join(lab_u, "src").join(lab_v, "dst")
    per = nb.groupBy("src").agg(
        (F.sum(F.when(F.col("lsrc") == F.col("ldst"), 1).otherwise(0)) / F.count("*")).alias(
            "coverage"
        )
    ).select(F.col("src").alias("node"), "coverage")
    return graph.nodes().join(per, "node", "left").select(
        "node", F.coalesce("coverage", F.lit(0.0)).alias("coverage")
    )


def permanence_centrality(graph: Graph, labels: DataFrame) -> DataFrame:
    """PermanenceCentrality (cpp/centrality/PermanenceCentrality.cpp:140-158,
    Chakraborty et al. KDD'14): for node v with community C,
    perm(v) = I(v) / (E_max(v) · deg(v)) − (1 − c_in(v)) where I = number of
    neighbors inside C, E_max = the largest neighbor count in any single
    OTHER community (0 → 1, per the reference), and c_in = edge density
    among v's internal neighbors (0 when I < 2,
    PermanenceCentrality.cpp:135).

    Relational plan: one labeled-neighbor self-join for I/E_max, one wedge
    join for the internal-neighbor triangle counts (same arboricity cost
    class as triangle counting; orient by degree at scale). Returns
    (node, score)."""
    lab = labels.select("node", "label")
    # eager materialization instead of a never-released persist (the frame
    # feeds the per-community stats AND the wedge join; blocks are freed by
    # the checkpoint cleaner instead of leaking per call)
    nb = _cc(
        graph.sym().select("src", "dst")
        .join(lab.select(F.col("node").alias("src"), F.col("label").alias("lu")), "src")
        .join(lab.select(F.col("node").alias("dst"), F.col("label").alias("lv")), "dst")
    )
    per_comm = nb.groupBy("src", "lu", "lv").agg(F.count("*").alias("c"))
    stats = per_comm.groupBy("src").agg(
        F.sum(F.when(F.col("lu") == F.col("lv"), F.col("c")).otherwise(0)).alias("i"),
        F.max(F.when(F.col("lu") != F.col("lv"), F.col("c")).otherwise(0)).alias("emax"),
        F.sum("c").alias("deg"),
    )
    # internal-neighbor pair edges: v-y, v-z internal wedges closed by y~z
    internal = nb.filter(F.col("lu") == F.col("lv")).select(
        F.col("src").alias("v"), F.col("dst").alias("y")
    )
    tri = (
        internal.join(
            graph.sym().select(F.col("src").alias("y"), F.col("dst").alias("z")), "y"
        )
        .join(
            internal.select(F.col("v").alias("v"), F.col("y").alias("z")),
            ["v", "z"],
            "left_semi",
        )
        .groupBy("v")
        .agg((F.count("*") / 2).alias("t"))
        .select(F.col("v").alias("src"), "t")
    )
    out = (
        stats.join(tri, "src", "left")
        .select(
            F.col("src").alias("node"),
            F.col("i"), F.col("deg"),
            F.greatest(F.col("emax"), F.lit(1)).alias("emax"),
            F.when(
                F.col("i") >= 2,
                F.coalesce("t", F.lit(0.0)) / (0.5 * F.col("i") * (F.col("i") - 1)),
            ).otherwise(F.lit(0.0)).alias("cin"),
        )
        .select(
            "node",
            (
                F.col("i") / F.col("emax") / F.col("deg") - (1.0 - F.col("cin"))
            ).alias("score"),
        )
    )
    res = graph.nodes().join(out, "node", "left").select(
        "node", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    return res


def agglomerative_clusterer(
    graph: Graph,
    max_rounds: int = 20,
    min_communities: int = 2,
    rel_threshold: float = 5e-3,
) -> DataFrame:
    """ParallelAgglomerativeClusterer
    (cpp/community/ParallelAgglomerativeClusterer.cpp:38-72): repeat
    { score edges by modularity gain, compute a heavy matching, contract
    matched pairs } until the graph stops shrinking (matched fraction ≤
    rel_threshold or fewer than min_communities supernodes), then project
    the coarsest supernodes back to the finest graph as communities.

    Spark mapping: scoring is one join-aggregate, the matching is the
    existing local-max handshake (matching.py — the distributed stand-in
    for the reference's PathGrowingMatcher), contraction reuses
    coarsen(); the fine→coarse hierarchy is folded into one (node, label)
    mapping by a join per level. Returns (node, label)."""
    from .matching import local_max_matching

    mapping = graph.nodes().select("node", F.col("node").alias("label"))
    g = graph
    for _ in range(max_rounds):
        n = g.num_nodes()
        if n < min_communities:
            break
        m2 = g.edges.agg(F.sum("weight")).collect()[0][0] or 1.0  # = m (undirected sum)
        wdeg = g.weighted_degrees()
        scored = (
            g.edges.filter(F.col("src") != F.col("dst"))
            .join(wdeg.select(F.col("node").alias("src"), F.col("wdeg").alias("wu")), "src")
            .join(wdeg.select(F.col("node").alias("dst"), F.col("wdeg").alias("wv")), "dst")
            .select(
                "src", "dst",
                (
                    F.col("weight") / F.lit(m2)
                    - F.col("wu") * F.col("wv") / F.lit(2.0 * m2 * m2)
                ).alias("weight"),
            )
            .filter(F.col("weight") > 0)
        )
        matching = local_max_matching(Graph(scored, directed=False, weighted=True))
        diff = matching.count()
        if diff == 0 or (n - diff) < min_communities or diff / n <= rel_threshold:
            break
        pair = matching.select(
            F.col("src").alias("node"), F.least("src", "dst").alias("to")
        ).unionByName(
            matching.select(F.col("dst").alias("node"), F.least("src", "dst").alias("to"))
        )
        rl = g.nodes().join(pair, "node", "left").select(
            "node", F.coalesce("to", F.col("node")).alias("label")
        ).transform(_cc)
        g = coarsen(g, rl)
        # LEFT join: coarsen() returns an edge-derived Graph, so an
        # ISOLATED supernode has no rl row — an inner join would silently
        # drop every fine node mapped to it from the returned partition
        mapping = (
            mapping.join(
                rl.select(F.col("node").alias("label"), F.col("label").alias("nl")),
                "label",
                "left",
            )
            .select("node", F.coalesce("nl", F.col("label")).alias("label"))
            .transform(_cc)
        )
    return mapping


def hashing_overlapper(partitions: list[DataFrame]) -> DataFrame:
    """HashingOverlapper (reference cpp/overlap/HashingOverlapper.cpp:14-94):
    combine k clusterings of the same node set into one core clustering whose
    cells are the common refinement — two nodes share a core cell iff they
    agree in EVERY input clustering.

    The reference combines per-clustering djb2 hashes of the labels (with a
    theoretical collision risk); here the combined key is the exact label
    tuple, so the result equals iterated :func:`partition_intersection` up to
    relabeling, without collisions. Labels are canonicalized to the min node
    id per cell. One k-way node join + one agg — a single shuffle regardless
    of k (vs k-1 chained intersections).
    """
    if not partitions:
        raise ValueError("hashing_overlapper needs at least one clustering")
    joined = partitions[0].select("node", F.col("label").alias("l0"))
    for i, p in enumerate(partitions[1:], start=1):
        joined = joined.join(
            p.select("node", F.col("label").alias(f"l{i}")), "node"
        )
    keys = [f"l{i}" for i in range(len(partitions))]
    cells = joined.groupBy(*keys).agg(F.min("node").alias("cell"))
    return joined.join(cells, keys).select("node", F.col("cell").alias("label"))
