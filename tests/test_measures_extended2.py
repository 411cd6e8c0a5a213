"""Isolated-interpartition measures, cover hub dominance, sampled Rand —
vs sequential replicas of the reference accumulation loops."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.measures import (
    cover_hub_dominance,
    isolated_interpartition_conductance,
    isolated_interpartition_expansion,
    rand_measure,
    sampled_rand_measure,
)

EDGES = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 3, 0.5), (3, 4, 2.0),
         (3, 5, 1.0), (4, 5, 3.0), (1, 4, 0.5)]
LABELS = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def _labels_df(spark, d):
    return spark.createDataFrame(sorted(d.items()), "node long, label long")


def _replica_iic(edges, labels):
    # IsolatedInterpartitionConductance.cpp accumulation
    cut, vol, total = {}, {}, 0.0
    for u, v, w in edges:
        if labels[u] != labels[v]:
            cut[labels[u]] = cut.get(labels[u], 0.0) + w
            cut[labels[v]] = cut.get(labels[v], 0.0) + w
        vol[labels[u]] = vol.get(labels[u], 0.0) + w
        vol[labels[v]] = vol.get(labels[v], 0.0) + w
        total += 2 * w
    out = {}
    for c in set(labels.values()):
        den = min(vol.get(c, 0.0), total - vol.get(c, 0.0))
        out[c] = cut.get(c, 0.0) / den if den > 0 else 0.0
    return out


def _replica_iie(edges, labels):
    n = len(labels)
    cut = {}
    for u, v, w in edges:
        if labels[u] != labels[v]:
            cut[labels[u]] = cut.get(labels[u], 0.0) + w
            cut[labels[v]] = cut.get(labels[v], 0.0) + w
    sizes = {}
    for v, c in labels.items():
        sizes[c] = sizes.get(c, 0) + 1
    return {
        c: cut.get(c, 0.0) / min(sizes[c], n - sizes[c])
        for c in sizes
    }


def test_isolated_interpartition_conductance(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=6)
    got = {
        r["label"]: r["value"]
        for r in isolated_interpartition_conductance(
            g, _labels_df(spark, LABELS)
        ).collect()
    }
    want = _replica_iic(EDGES, LABELS)
    assert set(got) == set(want)
    for c in want:
        assert abs(got[c] - want[c]) < 1e-12, c


def test_isolated_interpartition_expansion(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=6)
    got = {
        r["label"]: r["value"]
        for r in isolated_interpartition_expansion(
            g, _labels_df(spark, LABELS)
        ).collect()
    }
    want = _replica_iie(EDGES, LABELS)
    assert set(got) == set(want)
    for c in want:
        assert abs(got[c] - want[c]) < 1e-12, c


def test_cover_hub_dominance(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=6)
    # overlapping cover: node 2 and 3 belong to both clusters
    cover = [(0, 0), (1, 0), (2, 0), (3, 0), (2, 3), (3, 3), (4, 3), (5, 3)]
    cdf = spark.createDataFrame(cover, "node long, cluster long")
    got = {r["cluster"]: r["value"] for r in cover_hub_dominance(g, cdf).collect()}
    # cluster 0 = {0,1,2,3}: internal degrees 0:{1,2}=2, 1:{0,2}=2, 2:{0,1,3}=3,
    # 3:{2}=1 -> max 3 / (4-1)
    assert abs(got[0] - 3 / 3) < 1e-12
    # cluster 3 = {2,3,4,5}: 2:{3}=1, 3:{2,4,5}=3, 4:{3,5}=2, 5:{3,4}=2 -> 3/3
    assert abs(got[3] - 3 / 3) < 1e-12


def test_sampled_rand_converges_to_exact(spark):
    a = _labels_df(spark, LABELS)
    b = _labels_df(spark, {0: 0, 1: 0, 2: 3, 3: 3, 4: 3, 5: 3})
    exact = rand_measure(a, b)
    # sampling all C(6,2)=15 pairs must reproduce the exact value
    sampled = sampled_rand_measure(a, b, num_pairs=15)
    assert abs(sampled - exact) < 1e-12


def test_dynamic_nmi_restricts_to_common_nodes(spark):
    from networkit_spark.operators.measures import (
        dynamic_nmi_distance,
        nmi_distance,
    )

    old = _labels_df(spark, {0: 0, 1: 0, 2: 1, 3: 1})
    # snapshot 2 added nodes 4, 5 — they must not affect the distance
    new_core = {0: 7, 1: 7, 2: 9, 3: 9}
    new = _labels_df(spark, {**new_core, 4: 9, 5: 7})
    d = dynamic_nmi_distance(old, new)
    assert abs(d - nmi_distance(old, _labels_df(spark, new_core))) < 1e-12
    assert d < 1e-12  # identical partitions up to relabeling


def test_isolated_conductance_all_isolated_cluster_emits_zero(spark):
    """A non-empty cluster whose members are all isolated nodes must appear
    with value 0 (the reference emits a value for every non-empty subset;
    round-2 ADVICE item measures.py:249)."""
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=6)
    labels = dict(LABELS)
    labels[6] = 9
    labels[7] = 9  # cluster 9 = {6, 7}: no incident edges at all
    got = {
        r["label"]: r["value"]
        for r in isolated_interpartition_conductance(
            g, _labels_df(spark, labels)
        ).collect()
    }
    want = _replica_iic(EDGES, labels)
    assert set(got) == set(want) == {0, 3, 9}
    assert got[9] == 0.0
    for c, v in want.items():
        assert abs(got[c] - v) < 1e-12


def test_stable_nodes_isolated_and_weighted(spark):
    """StablePartitionNodes.cpp: isolated nodes are stable; stability
    compares summed edge WEIGHTS, not neighbor counts."""
    from networkit_spark.operators.measures import stable_partition_nodes

    # node 0: one heavy intra edge (w=10) vs two light inter edges (w=1+1=2)
    edges = [(0, 1, 10.0), (0, 2, 1.0), (0, 3, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=5)
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 2), (4, 4)], "node long, label long"
    )
    got = {r["node"]: r["stable"] for r in stable_partition_nodes(g, labels).collect()}
    assert got[0] is True     # weight 10 intra > 2 inter (count 1 > 2 is False)
    assert got[4] is True     # isolated => stable (reference comment)
    assert got[2] is False    # only inter weight, own weight 0


def test_missing_links_limited_node_both_sides(spark):
    """A limited node's candidates include partners with SMALLER ids —
    canonicalization happens after generation."""
    from networkit_spark.operators.linkprediction import missing_links

    # wedge 3 - 9 - 5: pair (3,5) at distance 2
    edges = [(3, 9, 1.0), (9, 5, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    limit = spark.createDataFrame([(5,)], "node long")
    got = {(r["u"], r["v"]) for r in missing_links(g, limit_nodes=limit).collect()}
    assert (3, 5) in got


def test_missing_links_k_hop_exact_distance(spark):
    from networkit_spark.operators.linkprediction import missing_links

    # path 0-1-2-3: distance-3 pair is exactly (0,3)
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    got2 = {(r["u"], r["v"]) for r in missing_links(g, k_hop=2).collect()}
    got3 = {(r["u"], r["v"]) for r in missing_links(g, k_hop=3).collect()}
    assert got2 == {(0, 2), (1, 3)}
    assert got3 == {(0, 3)}


def test_modularity_self_loop_volume(spark):
    """Modularity.cpp:59 counts self-loops twice in the volume: edge (0,1)
    + loop (1,1), one community -> vol = 4 = 2m -> modularity exactly 0."""
    from networkit_spark.operators.community import modularity

    edges = [(0, 1, 1.0), (1, 1, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    labels = spark.createDataFrame([(0, 0), (1, 0)], "node long, label long")
    assert modularity(g, labels) == pytest.approx(0.0)
