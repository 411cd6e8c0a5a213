import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.community import (
    coarsen,
    coverage,
    edge_cut,
    conductance,
    modularity,
    plp,
)

from reference_oracles import numpy_plp_sync


def planted_cliques(n, k):
    """FIXTURES.md §6: node i in clique i%k, cliques fully connected,
    no inter-clique edges (ClusteredRandomGraphGenerator(n,k,1.0,0.0) analog)."""
    edges = []
    for c in range(k):
        members = [i for i in range(n) if i % k == c]
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                edges.append((members[a], members[b]))
    return edges


@pytest.mark.parametrize("k", [2, 3])
def test_plp_planted_partition(spark, k):
    """CommunityGTest.cpp:68-106: PLP finds exactly k communities on k
    disjoint cliques; labels = min member id."""
    n = 60
    edges = planted_cliques(n, k)
    g = Graph.from_edge_list(spark, edges, num_nodes=n)
    labels = plp(g, max_iter=20)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert len(set(got.values())) == k
    for i in range(n):
        assert got[i] == i % k  # min member of clique c is c itself


def test_plp_isolated_and_selfloop_singletons(spark):
    """PLP.cpp:50-61: isolated nodes stay singletons; CommunityGTest:108+:
    a self-loop-only node stays a singleton."""
    edges = [(0, 1), (2, 2)]
    g = Graph.from_edge_list(spark, edges, num_nodes=4)
    got = {r["node"]: r["label"] for r in plp(g, max_iter=10).collect()}
    assert got[3] == 3
    assert got[2] == 2
    assert got[0] == got[1] == 0


def test_plp_matches_numpy_sync_oracle(spark):
    """Fixed-iteration parity vs the dense synchronous replica."""
    rng = np.random.RandomState(7)
    n = 30
    edges = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(60, 2)) if a != b]
    edges = sorted({(min(a, b), max(a, b)) for a, b in edges})
    g = Graph.from_edge_list(spark, edges, num_nodes=n)
    for iters in (1, 3, 5):
        got = {r["node"]: r["label"] for r in plp(g, fixed_iters=iters).collect()}
        exact = numpy_plp_sync(edges, n, iters)
        assert [got[i] for i in range(n)] == list(exact), f"iters={iters}"


def test_modularity_two_cliques(spark):
    """Two triangles joined by one edge; hand modularity check
    (Modularity.cpp:28-81 formula)."""
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, num_nodes=6)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "node long, label long"
    )
    m = 7.0
    coverage_exp = 6.0 / 7.0
    vol0 = 2 + 2 + 3  # degrees of 0,1,2
    vol1 = 3 + 2 + 2
    mod_exp = coverage_exp - ((vol0 / (2 * m)) ** 2 + (vol1 / (2 * m)) ** 2)
    assert modularity(g, labels) == pytest.approx(mod_exp, abs=1e-12)
    assert coverage(g, labels) == pytest.approx(coverage_exp, abs=1e-12)
    assert edge_cut(g, labels) == pytest.approx(1.0)
    assert conductance(g, labels, 0) == pytest.approx(1.0 / 7.0)


def test_plp_modularity_range(spark):
    """CommunityGTest.cpp:50-66: proper clustering, modularity ∈ [-0.5, 1]."""
    rng = np.random.RandomState(42)
    n = 50
    edges = sorted(
        {(min(int(a), int(b)), max(int(a), int(b)))
         for a, b in rng.randint(0, n, size=(120, 2)) if a != b}
    )
    g = Graph.from_edge_list(spark, edges, num_nodes=n)
    labels = plp(g, max_iter=15)
    assert labels.count() == n  # proper clustering: every node labeled once
    mod = modularity(g, labels)
    assert -0.5 <= mod <= 1.0


def test_coarsen(spark):
    """ParallelPartitionCoarsening: contract two triangles + bridge into a
    2-node graph with loop weights 3 and bridge weight 1."""
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, num_nodes=6)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "node long, label long"
    )
    cg = coarsen(g, labels)
    got = {(r["src"], r["dst"]): r["weight"] for r in cg.edges.collect()}
    assert got == {(0, 0): 3.0, (1, 1): 3.0, (0, 1): 1.0}
