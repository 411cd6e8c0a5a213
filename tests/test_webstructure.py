"""Web-structure operators: HITS, reciprocity, bow-tie decomposition.

HITS is checked against an in-test NumPy replica of Kleinberg's normalized
power method (the operators are Spark-first extensions with no reference
C++ twin — the replica IS the spec); bow-tie against a hand-built graph
containing every Broder region.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.webstructure import (
    BOWTIE_REGIONS,
    bowtie_decomposition,
    bowtie_profile,
    hits,
    reciprocity,
)


# -- reciprocity -----------------------------------------------------------

def test_reciprocity_half(spark):
    # 4 arcs, one reciprocal pair → 2/4
    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 0), (1, 2), (2, 3)], directed=True
    )
    assert reciprocity(g) == pytest.approx(0.5)


def test_reciprocity_ignores_self_loops_and_duplicates(spark):
    g = Graph.from_edge_list(
        spark, [(0, 0), (0, 1), (0, 1), (1, 0)], directed=True
    )
    assert reciprocity(g) == pytest.approx(1.0)


def test_reciprocity_empty_and_undirected(spark):
    only_loop = Graph.from_edge_list(spark, [(3, 3)], directed=True)
    assert reciprocity(only_loop) == 0.0
    und = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    assert reciprocity(und) == 1.0


# -- HITS ------------------------------------------------------------------

def _hits_replica(n, arcs, iters):
    """NumPy normalized power method, same update order as the operator."""
    A = np.zeros((n, n))
    for u, v, w in arcs:
        A[u, v] += w
    hub = np.full(n, 1.0 / math.sqrt(n))
    auth = np.full(n, 1.0 / math.sqrt(n))
    for _ in range(iters):
        auth = A.T @ hub
        auth /= np.linalg.norm(auth) or 1.0
        hub = A @ auth
        hub /= np.linalg.norm(hub) or 1.0
    return hub, auth


HITS_ARCS = [
    (0, 1, 1.0), (0, 2, 2.0), (1, 2, 1.0), (3, 2, 1.0), (2, 4, 1.0),
    (4, 0, 1.0), (3, 1, 2.0),
]


def test_hits_matches_numpy_replica(spark):
    g = Graph.from_edge_list(spark, HITS_ARCS, directed=True, weighted=True)
    rows = {r.node: r for r in hits(g, fixed_iters=8).collect()}
    hub, auth = _hits_replica(5, HITS_ARCS, 8)
    for v in range(5):
        assert rows[v].hub == pytest.approx(hub[v], abs=1e-9)
        assert rows[v].auth == pytest.approx(auth[v], abs=1e-9)


def test_hits_converged_is_principal_eigenvector(spark):
    g = Graph.from_edge_list(spark, HITS_ARCS, directed=True, weighted=True)
    rows = {r.node: r for r in hits(g, tol=1e-12, max_iter=200).collect()}
    hub, auth = _hits_replica(5, HITS_ARCS, 300)
    for v in range(5):
        assert rows[v].hub == pytest.approx(hub[v], abs=1e-6)
        assert rows[v].auth == pytest.approx(auth[v], abs=1e-6)
    # unit norms
    assert sum(r.hub ** 2 for r in rows.values()) == pytest.approx(1.0)
    assert sum(r.auth ** 2 for r in rows.values()) == pytest.approx(1.0)


# -- bow-tie ---------------------------------------------------------------

# one node in every region:
#   core {1,2}; in {0}; out {3}; tube {4} (0→4→3 bypasses core);
#   tendril_in {5} (0→5); tendril_out {6} (6→3); disconnected {7,8}
BOWTIE_ARCS = [
    (1, 2), (2, 1),          # core SCC
    (0, 1),                  # in
    (2, 3),                  # out
    (0, 4), (4, 3),          # tube
    (0, 5),                  # tendril hanging off IN
    (6, 3),                  # tendril feeding OUT
    (7, 8),                  # disconnected pair
]
BOWTIE_EXPECTED = {
    0: "in", 1: "core", 2: "core", 3: "out", 4: "tube",
    5: "tendril_in", 6: "tendril_out", 7: "disconnected", 8: "disconnected",
}


def test_bowtie_regions(spark):
    g = Graph.from_edge_list(spark, BOWTIE_ARCS, directed=True)
    got = {r.node: r.region for r in bowtie_decomposition(g).collect()}
    assert got == BOWTIE_EXPECTED


def test_bowtie_partition_is_total(spark):
    g = Graph.from_edge_list(spark, BOWTIE_ARCS, directed=True)
    rows = bowtie_decomposition(g).collect()
    assert len(rows) == len({r.node for r in rows}) == 9
    assert {r.region for r in rows} <= set(BOWTIE_REGIONS)


def test_bowtie_profile_fracs(spark):
    g = Graph.from_edge_list(spark, BOWTIE_ARCS, directed=True)
    prof = {r.region: (r.n_nodes, r.frac) for r in bowtie_profile(g).collect()}
    assert prof["core"] == (2, pytest.approx(2 / 9, abs=1e-6))
    assert prof["disconnected"][0] == 2
    assert sum(v[0] for v in prof.values()) == 9


def test_bowtie_requires_directed(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        bowtie_decomposition(g)


def test_bowtie_all_core(spark):
    # a single cycle: everything is the core
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    got = {r.node: r.region for r in bowtie_decomposition(g).collect()}
    assert got == {0: "core", 1: "core", 2: "core"}


# -- degree-structure analytics -------------------------------------------

def test_powerlaw_alpha_matches_formula(spark):
    from networkit_spark.operators.webstructure import powerlaw_alpha

    g = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (0, 3), (1, 2), (4, 0)], directed=False
    )
    degs = {0: 4, 1: 2, 2: 2, 3: 1, 4: 1}
    expected = 1.0 + len(degs) / sum(math.log(d / 0.5) for d in degs.values())
    assert powerlaw_alpha(g, xmin=1) == pytest.approx(expected, abs=1e-12)
    degs2 = {d for d in degs.values() if d >= 2}
    expected2 = 1.0 + 3 / sum(
        math.log(d / 1.5) for n, d in degs.items() if d >= 2
    )
    assert powerlaw_alpha(g, xmin=2) == pytest.approx(expected2, abs=1e-12)


def test_rich_club_star_plus_clique(spark):
    from networkit_spark.operators.webstructure import rich_club

    # triangle {0,1,2} plus pendant 3-0: degrees 0:3, 1:2, 2:2, 3:1
    g = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (1, 2), (0, 3)], directed=False
    )
    rows = {r.k: r for r in rich_club(g).collect()}
    assert set(rows) == {1, 2, 3}
    # k=1: nodes {0,1,2} (deg>1), edges among them = 3 → phi = 1.0
    assert (rows[1].n_nodes, rows[1].n_edges) == (3, 3)
    assert rows[1].phi == pytest.approx(1.0)
    # k=2: nodes {0} → phi undefined (null)
    assert (rows[2].n_nodes, rows[2].n_edges) == (1, 0)
    assert rows[2].phi is None
    # k=3: no nodes
    assert (rows[3].n_nodes, rows[3].n_edges) == (0, 0)


def test_rich_club_replica_random(spark):
    import itertools, random
    from networkit_spark.operators.webstructure import rich_club

    rng = random.Random(11)
    edges = [
        (u, v) for u, v in itertools.combinations(range(20), 2)
        if rng.random() < 0.25
    ]
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    g = Graph.from_edge_list(spark, edges, directed=False)
    rows = {r.k: r for r in rich_club(g).collect()}
    for k in sorted(set(deg.values())):
        nk = sum(1 for d in deg.values() if d > k)
        ek = sum(1 for u, v in edges if deg[u] > k and deg[v] > k)
        assert (rows[k].n_nodes, rows[k].n_edges) == (nk, ek), k
        if nk > 1:
            assert rows[k].phi == pytest.approx(2 * ek / (nk * (nk - 1)))


# -- SALSA -----------------------------------------------------------------

def _salsa_replica(n, arcs, iters):
    W = np.zeros((n, n))
    for u, v, w in arcs:
        W[u, v] += w
    outd = W.sum(axis=1)
    ind = W.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        B = np.where(ind > 0, W / ind, 0.0)          # B[q,p]: auth p -> hub q
        Fw = np.where(outd[:, None] > 0, W / outd[:, None], 0.0)  # q -> auth r
    a = (ind > 0) / max((ind > 0).sum(), 1)
    h = (outd > 0) / max((outd > 0).sum(), 1)
    for _ in range(iters):
        a = Fw.T @ (B @ a)
        h = B @ (Fw.T @ h)
    return h, a


def test_salsa_matches_numpy_replica(spark):
    from networkit_spark.operators.webstructure import salsa

    g = Graph.from_edge_list(spark, HITS_ARCS, directed=True, weighted=True)
    rows = {r.node: r for r in salsa(g, fixed_iters=6).collect()}
    hub, auth = _salsa_replica(5, HITS_ARCS, 6)
    for v in range(5):
        assert rows[v].hub == pytest.approx(hub[v], abs=1e-12)
        assert rows[v].auth == pytest.approx(auth[v], abs=1e-12)
    # mass conservation, both chains
    assert sum(r.auth for r in rows.values()) == pytest.approx(1.0)
    assert sum(r.hub for r in rows.values()) == pytest.approx(1.0)


def test_salsa_stationary_is_indegree_proportional(spark):
    from networkit_spark.operators.webstructure import salsa

    # connected co-citation structure: stationary auth ∝ in-degree
    arcs = [(0, 2), (1, 2), (0, 3), (1, 3), (2, 4), (0, 4), (3, 4)]
    ind = {}
    for _, v in arcs:
        ind[v] = ind.get(v, 0) + 1
    tot = sum(ind.values())
    g = Graph.from_edge_list(spark, arcs, directed=True)
    rows = {r.node: r for r in salsa(g, tol=1e-14, max_iter=500).collect()}
    for v, d in ind.items():
        assert rows[v].auth == pytest.approx(d / tot, abs=1e-6), v
    for v in (0, 1):  # no in-links → zero authority
        assert rows[v].auth == pytest.approx(0.0, abs=1e-12)


def test_avg_neighbor_degree_and_knn(spark):
    from networkit_spark.operators.webstructure import (
        avg_neighbor_degree,
        knn_degree_correlation,
    )

    # star center 0 with 3 leaves + disjoint edge (4,5)
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (0, 3), (4, 5)])
    annd = {r.node: r.and_deg for r in avg_neighbor_degree(g).collect()}
    assert annd[0] == pytest.approx(1.0)   # leaves have degree 1
    assert annd[1] == pytest.approx(3.0)   # center degree 3
    assert annd[4] == pytest.approx(1.0)
    knn = {r.k: r.knn for r in knn_degree_correlation(g).collect()}
    # degree-1 nodes: leaves see 3.0, the (4,5) pair sees 1.0 -> (3*3+2*1)/5
    assert knn[1] == pytest.approx((3 * 3 + 2 * 1) / 5)
    assert knn[3] == pytest.approx(1.0)


def test_hits_salsa_empty_and_arcless(spark):
    """Empty / arcless graphs return explicit zero frames instead of
    dividing by zero (consistent with bowtie/reciprocity handling)."""
    from networkit_spark.operators.webstructure import salsa

    empty = Graph(
        spark.createDataFrame([], "src long, dst long, weight double"),
        directed=True,
    )
    assert hits(empty).count() == 0
    assert salsa(empty).count() == 0
    # self-loop-only graph: nodes exist but salsa's normalized transition is
    # still well-defined (loop arcs); a graph with nodes but NO arcs at all
    # can't be expressed via an edge table, so empty covers the arcless case.
