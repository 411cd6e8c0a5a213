"""Partition comparison + local community quality measures.

Reference: /root/reference/networkit/cpp/community/ —
NodeStructuralRandMeasure.cpp, AdjustedRandMeasure, JaccardMeasure,
NMIDistance.cpp (all pair-counting / information-theoretic over two
partitions), IntrapartitionDensity, PartitionFragmentation,
PartitionHubDominance, StablePartitionNodes, IsolatedInterpartitionConductance.

Pair-counting never enumerates the O(n²) pairs: everything derives from the
contingency table ``groupBy(label_a, label_b).count()`` (the standard
sufficient statistic), so cost is one shuffle on the label pair.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc


def _contingency(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.withColumnRenamed("label", "la")
        .join(b.withColumnRenamed("label", "lb"), "node")
        .groupBy("la", "lb")
        .agg(F.count("*").alias("nij"))
    )


def _pair_counts(a: DataFrame, b: DataFrame) -> tuple[float, float, float, int]:
    """(same_both, same_a, same_b, n) as pair counts C(x,2) sums."""
    ct = _contingency(a, b).persist()
    c2 = lambda c: F.sum(F.col(c) * (F.col(c) - 1) / 2.0)
    s11 = ct.agg(c2("nij")).collect()[0][0] or 0.0
    sa = (
        ct.groupBy("la").agg(F.sum("nij").alias("ni"))
        .agg(F.sum(F.col("ni") * (F.col("ni") - 1) / 2.0)).collect()[0][0] or 0.0
    )
    sb = (
        ct.groupBy("lb").agg(F.sum("nij").alias("nj"))
        .agg(F.sum(F.col("nj") * (F.col("nj") - 1) / 2.0)).collect()[0][0] or 0.0
    )
    n = int(ct.agg(F.sum("nij")).collect()[0][0] or 0)
    ct.unpersist()
    return float(s11), float(sa), float(sb), n


def rand_measure(a: DataFrame, b: DataFrame) -> float:
    """NodeStructuralRandMeasure: DISSIMILARITY in [0,1] — fraction of node
    pairs the two clusterings disagree on (reference returns a distance)."""
    s11, sa, sb, n = _pair_counts(a, b)
    total = n * (n - 1) / 2.0
    if total == 0:
        return 0.0
    agree = s11 + (total - sa - sb + s11)
    return 1.0 - agree / total


def adjusted_rand_measure(a: DataFrame, b: DataFrame) -> float:
    """AdjustedRandMeasure: 1 - ARI (a distance, like the reference)."""
    s11, sa, sb, n = _pair_counts(a, b)
    total = n * (n - 1) / 2.0
    if total == 0:
        return 0.0
    expected = sa * sb / total
    max_idx = (sa + sb) / 2.0
    if max_idx == expected:
        return 0.0
    ari = (s11 - expected) / (max_idx - expected)
    return 1.0 - ari


def jaccard_measure(a: DataFrame, b: DataFrame) -> float:
    """JaccardMeasure: 1 - |S11| / (|S11| + disagreements) over pairs."""
    s11, sa, sb, n = _pair_counts(a, b)
    denom = sa + sb - s11
    if denom == 0:
        return 0.0
    return 1.0 - s11 / denom


def nmi_distance(a: DataFrame, b: DataFrame) -> float:
    """NMIDistance.cpp: 1 - NMI (normalized by max entropy).

    Fully distributed: the contingency table stays a DataFrame; marginals
    come from two small re-aggregations joined back on the label, and the
    MI / entropy sums are single scalar aggregations — only three scalars
    ever reach the driver (no contingency collect)."""
    ct = _contingency(a, b).persist()
    n = int(ct.agg(F.sum("nij")).collect()[0][0] or 0)
    if n == 0:
        return 0.0
    ni = ct.groupBy("la").agg(F.sum("nij").alias("ni"))
    nj = ct.groupBy("lb").agg(F.sum("nij").alias("nj"))
    row = (
        ct.join(ni, "la").join(nj, "lb")
        .agg(
            F.sum(
                (F.col("nij") / n)
                * F.log((F.col("nij") / n) / ((F.col("ni") / n) * (F.col("nj") / n)))
            ).alias("mi")
        )
        .collect()[0]
    )
    ha = -float(
        ni.agg(F.sum((F.col("ni") / n) * F.log(F.col("ni") / n))).collect()[0][0] or 0.0
    )
    hb = -float(
        nj.agg(F.sum((F.col("nj") / n) * F.log(F.col("nj") / n))).collect()[0][0] or 0.0
    )
    ct.unpersist()
    mi = float(row["mi"] or 0.0)
    hmax = max(ha, hb)
    if hmax == 0:
        return 0.0
    return 1.0 - mi / hmax


# -- local (per-community) quality measures ---------------------------------

def intrapartition_density(graph: Graph, labels: DataFrame) -> DataFrame:
    """IntrapartitionDensity: per community, intra-edge count / C(size, 2)."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    intra = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .join(la, "src").join(lb, "dst")
        .filter(F.col("lsrc") == F.col("ldst"))
        .groupBy(F.col("lsrc").alias("label"))
        .agg(F.count("*").alias("m_in"))
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    return sizes.join(intra, "label", "left").select(
        "label",
        F.when(
            F.col("size") >= 2,
            F.coalesce("m_in", F.lit(0)) / (F.col("size") * (F.col("size") - 1) / 2.0),
        ).otherwise(0.0).alias("density"),
    )


def partition_fragmentation(graph: Graph, labels: DataFrame) -> DataFrame:
    """PartitionFragmentation: per community, 1 - (largest connected chunk
    inside the community) / community size."""
    from .components import connected_components

    sub = graph.subgraph_from_nodes(labels.select("node"))
    # components within each community: restrict edges to intra-community
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    intra_edges = (
        sub.edges.join(la, "src").join(lb, "dst")
        .filter(F.col("lsrc") == F.col("ldst"))
        .select("src", "dst", "weight")
    )
    intra_graph = Graph(intra_edges, directed=False, weighted=graph.weighted)
    comp = connected_components(Graph(
        intra_edges.unionByName(
            labels.select(F.col("node").alias("src"), F.col("node").alias("dst"))
            .withColumn("weight", F.lit(1.0))
        ),
        directed=False,
    ))
    chunk = (
        labels.join(comp, "node")
        .groupBy("label", "component")
        .agg(F.count("*").alias("chunk"))
        .groupBy("label")
        .agg(F.max("chunk").alias("largest"))
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    return sizes.join(chunk, "label").select(
        "label", (1.0 - F.col("largest") / F.col("size")).alias("fragmentation")
    )


def partition_hub_dominance(graph: Graph, labels: DataFrame) -> DataFrame:
    """PartitionHubDominance: per community, max internal degree /
    (size - 1)."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    internal_deg = (
        graph.sym().join(la, "src").join(lb, "dst")
        .filter(F.col("lsrc") == F.col("ldst"))
        .groupBy("src", "lsrc")
        .agg(F.count("*").alias("d_in"))
        .groupBy(F.col("lsrc").alias("label"))
        .agg(F.max("d_in").alias("max_in"))
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    return sizes.join(internal_deg, "label", "left").select(
        "label",
        F.when(
            F.col("size") >= 2, F.coalesce("max_in", F.lit(0)) / (F.col("size") - 1.0)
        ).otherwise(0.0).alias("hub_dominance"),
    )


def stable_partition_nodes(graph: Graph, labels: DataFrame) -> DataFrame:
    """StablePartitionNodes.cpp:10-42: per node, is the node 'stable' —
    strictly more incident edge WEIGHT into its own community than into any
    other single community, with positive own weight required; isolated
    nodes are stable by definition (.cpp:23 comment). Deviation noted: the
    reference accumulates edge weights into an integer ``count`` map
    (silently truncating fractional weights); we sum true weights."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    cnt = (
        graph.sym().join(la, "src").join(lb, "dst")
        .groupBy("src", "lsrc", "ldst")
        .agg(F.sum("weight").alias("c"))
    )
    own = cnt.filter(F.col("lsrc") == F.col("ldst")).select(
        F.col("src").alias("node"), F.col("c").alias("own_c")
    )
    best_other = (
        cnt.filter(F.col("lsrc") != F.col("ldst"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.max("c").alias("other_c"))
    )
    deg = graph.degrees()
    return (
        labels.select("node")
        .join(deg, "node", "left")
        .join(own, "node", "left")
        .join(best_other, "node", "left")
        .select(
            "node",
            F.when(F.coalesce("degree", F.lit(0)) == 0, F.lit(True))
            .otherwise(
                (F.coalesce("own_c", F.lit(0.0)) > 0)
                & (
                    F.coalesce("own_c", F.lit(0.0))
                    > F.coalesce("other_c", F.lit(0.0))
                )
            )
            .alias("stable"),
        )
    )


def clustering_generator_singleton(graph: Graph) -> DataFrame:
    """ClusteringGenerator::makeSingletonClustering."""
    return graph.nodes().select("node", F.col("node").alias("label"))


def clustering_generator_one(graph: Graph) -> DataFrame:
    """ClusteringGenerator::makeOneClustering."""
    return graph.nodes().select("node", F.lit(0).cast("long").alias("label"))


def clustering_generator_random(graph: Graph, k: int, seed: int = 42) -> DataFrame:
    """makeRandomClustering — deterministic hash-based assignment."""
    return graph.nodes().select(
        "node", (F.abs(F.xxhash64("node", F.lit(seed))) % k).alias("label")
    )


def isolated_interpartition_conductance(graph: Graph, labels: DataFrame) -> DataFrame:
    """IsolatedInterpartitionConductance.cpp:8-60: per cluster,
    cut / min(volume, total_volume - volume), where each edge contributes w
    to both endpoint clusters' volumes (intra edges 2w to one cluster) and
    inter-cluster edges contribute w to both clusters' cuts. Returns
    (label, value). Every non-empty cluster gets a row — a cluster whose
    members are all isolated nodes has volume 0 and value 0, matching the
    reference's per-subset emission (the row set starts from the labels, not
    from the edge-incident volume table)."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    # eager materialization (not persist/unpersist — an unpersist before the
    # lazy result is consumed is a no-op persist, and the two label joins
    # would re-run in all four union branches)
    e = _cc(graph.edges.join(la, "src").join(lb, "dst"))
    vol = (
        e.select(F.col("lsrc").alias("label"), "weight")
        .unionByName(e.select(F.col("ldst").alias("label"), "weight"))
        .groupBy("label").agg(F.sum("weight").alias("vol"))
    )
    cut = (
        e.filter(F.col("lsrc") != F.col("ldst"))
        .select(F.col("lsrc").alias("label"), "weight")
        .unionByName(
            e.filter(F.col("lsrc") != F.col("ldst"))
            .select(F.col("ldst").alias("label"), "weight")
        )
        .groupBy("label").agg(F.sum("weight").alias("cut"))
    )
    total = 2.0 * float(
        graph.edges.agg(F.sum("weight")).collect()[0][0] or 0.0
    )
    clusters = labels.select("label").distinct()
    return (
        clusters.join(vol, "label", "left")
        .join(cut, "label", "left")
        .select(
            "label",
            F.when(
                F.least(
                    F.coalesce("vol", F.lit(0.0)),
                    F.lit(total) - F.coalesce("vol", F.lit(0.0)),
                )
                > 0,
                F.coalesce("cut", F.lit(0.0))
                / F.least(F.col("vol"), F.lit(total) - F.col("vol")),
            )
            .otherwise(0.0)
            .alias("value"),
        )
    )


def isolated_interpartition_expansion(graph: Graph, labels: DataFrame) -> DataFrame:
    """IsolatedInterpartitionExpansion.cpp: same cut as the conductance
    variant, denominator min(cluster_size, n - cluster_size). (label, value)."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    inter = (
        graph.edges.join(la, "src").join(lb, "dst")
        .filter(F.col("lsrc") != F.col("ldst"))
    )
    cut = (
        inter.select(F.col("lsrc").alias("label"), "weight")
        .unionByName(inter.select(F.col("ldst").alias("label"), "weight"))
        .groupBy("label").agg(F.sum("weight").alias("cut"))
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    n = labels.count()
    return sizes.join(cut, "label", "left").select(
        "label",
        F.when(
            F.least(F.col("size"), F.lit(n) - F.col("size")) > 0,
            F.coalesce("cut", F.lit(0.0))
            / F.least(F.col("size"), F.lit(n) - F.col("size")),
        ).otherwise(0.0).alias("value"),
    )


def cover_hub_dominance(graph: Graph, cover: DataFrame) -> DataFrame:
    """CoverHubDominance.cpp: covers are overlapping — ``cover`` has one
    (node, cluster) row PER MEMBERSHIP. Per cluster: max internal degree
    (neighbors sharing the cluster) / (cluster_size - 1). (cluster, value)."""
    ca = cover.select(F.col("node").alias("src"), F.col("cluster").alias("cs"))
    cb = cover.select(F.col("node").alias("dst"), F.col("cluster").alias("cd"))
    sym = graph.sym().select("src", "dst").filter(F.col("src") != F.col("dst"))
    internal = (
        sym.join(ca, "src").join(cb, "dst")
        .filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("src").alias("node"), F.col("cs").alias("cluster"))
        .agg(F.count("*").alias("ideg"))
    )
    max_ideg = internal.groupBy("cluster").agg(F.max("ideg").alias("mdeg"))
    sizes = cover.groupBy("cluster").agg(F.count("*").alias("size"))
    return sizes.join(max_ideg, "cluster", "left").select(
        "cluster",
        F.when(
            F.col("size") > 1,
            F.coalesce("mdeg", F.lit(0)) / (F.col("size") - 1.0),
        ).otherwise(1.0).alias("value"),
    )


def sampled_rand_measure(
    a: DataFrame, b: DataFrame, num_pairs: int, seed: int = 42
) -> float:
    """Sampled(Node|Graph)StructuralRandMeasure shape: Rand distance
    estimated on a deterministic hash-sample of node PAIRS (the reference
    draws random pairs; a seeded hash over the node set is the reproducible
    analog). Distributed: the sampled nodes self-join once."""
    from ..functions.dedup import hash60

    joint = a.withColumnRenamed("label", "la").join(
        b.withColumnRenamed("label", "lb"), "node"
    )
    h = hash60(F.concat_ws(":", F.col("node").cast("string"), F.lit(str(seed))))
    k = max(2, int((2 * num_pairs) ** 0.5) + 1)
    sampled = joint.withColumn("h", h).orderBy("h", "node").limit(k)
    l = sampled.select(F.col("node").alias("u"), F.col("la").alias("lau"), F.col("lb").alias("lbu"))
    r = sampled.select(F.col("node").alias("v"), F.col("la").alias("lav"), F.col("lb").alias("lbv"))
    pairs = l.join(r, F.col("u") < F.col("v"))
    row = pairs.agg(
        F.count("*").alias("total"),
        F.sum(
            (
                (F.col("lau") == F.col("lav")) != (F.col("lbu") == F.col("lbv"))
            ).cast("long")
        ).alias("disagree"),
    ).collect()[0]
    total = row["total"] or 0
    return float(row["disagree"]) / total if total else 0.0


def dynamic_nmi_distance(old_labels: DataFrame, new_labels: DataFrame) -> float:
    """DynamicNMIDistance.cpp:25-130: NMI distance between consecutive
    clustering snapshots of a DYNAMIC graph — marginals and the confusion
    matrix count only nodes present in BOTH snapshots (isInBoth), so node
    additions/removals between snapshots don't distort the comparison.

    The inner node join in :func:`nmi_distance`'s contingency IS that
    restriction, so the dynamic variant shares the implementation; this
    wrapper exists for API parity and documents the semantics."""
    return nmi_distance(old_labels, new_labels)


def graph_structural_rand_measure(graph: Graph, a: DataFrame, b: DataFrame) -> float:
    """GraphStructuralRandMeasure (reference
    cpp/community/GraphStructuralRandMeasure.cpp:13-37): Rand dissimilarity
    restricted to CONNECTED node pairs — 1 - (e11 + e00)/m where e11 counts
    edges whose endpoints agree in both clusterings and e00 edges whose
    endpoints disagree in both.

    Distributed: two label joins on the edge table + one agg — O(m), no pair
    materialization (vs the node-structural measure's O(n^2) contingency
    shortcut)."""
    la = a.select(F.col("node").alias("src"), F.col("label").alias("lau"))
    lb = b.select(F.col("node").alias("src"), F.col("label").alias("lbu"))
    ra = a.select(F.col("node").alias("dst"), F.col("label").alias("lav"))
    rb = b.select(F.col("node").alias("dst"), F.col("label").alias("lbv"))
    e = graph.edges.join(la, "src").join(lb, "src").join(ra, "dst").join(rb, "dst")
    row = e.agg(
        F.count("*").alias("m"),
        F.sum(
            (
                (F.col("lau") == F.col("lav")) == (F.col("lbu") == F.col("lbv"))
            ).cast("long")
        ).alias("same"),
    ).collect()[0]
    m = row["m"] or 0
    if m == 0:
        raise ValueError("graph-structural rand measure undefined without edges")
    return 1.0 - float(row["same"]) / m


def partition_imbalance(labels: DataFrame) -> float:
    """computeImbalance (reference networkit/partitioning.py:28-33):
    max subset size / ceil(n / #subsets). Two tiny aggregations."""
    sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
    row = sizes.agg(
        F.max("sz").alias("mx"), F.sum("sz").alias("n"), F.count("*").alias("k")
    ).collect()[0]
    if not row["k"]:
        return 0.0
    desired = math.ceil(row["n"] / float(row["k"]))
    return float(row["mx"]) / desired
