"""GCE greedy community expansion vs an exact replica of the reference loop
(cpp/scd/GCE.cpp:27-195, objective M)."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.scd import gce_expand


def gce_reference(edges, seed, max_steps=None):
    """Line-for-line replica of GCE::expandSeed (GCE.cpp:27-195), objective M.

    ``edges``: undirected simple (u, v) pairs. Absorbing the last external
    edge gives dQ = x/0 = +inf in the C++ double arithmetic; replicated with
    float('inf'). The scan iterates the shell in ascending order and keeps
    the LAST ``dQ >= dQMax`` node (GCE.cpp:168-177) → ties go to the highest
    id.
    """
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    community = {seed}
    shell = set(adj.get(seed, ()))
    steps = 0
    while max_steps is None or steps < max_steps:
        int_edges = sum(len(adj[u] & community) for u in community) // 2
        ext_edges = sum(len(adj[u] - community) for u in community)
        cur_q = int_edges / ext_edges if ext_edges else 0.0
        dq_max, v_max = 0.0, None
        for v in sorted(shell):
            deg_int = len(adj[v] & community)
            deg_ext = len(adj[v] - community)
            den = ext_edges - deg_int + deg_ext
            dq = (
                float("inf")
                if den == 0
                else (int_edges + deg_int) / den - cur_q
            )
            if dq >= dq_max:
                dq_max, v_max = dq, v
        if v_max is None:
            break
        community.add(v_max)
        shell.discard(v_max)
        shell |= adj[v_max] - community
        steps += 1
    return community


# two 5-cliques bridged by one edge, plus a pendant chain off clique B
CLIQUE_A = [(a, b) for a in range(5) for b in range(a + 1, 5)]
CLIQUE_B = [(a + 5, b + 5) for a in range(5) for b in range(a + 1, 5)]
BRIDGE = [(4, 5)]
CHAIN = [(9, 10), (10, 11)]
TWO_CLIQUES = CLIQUE_A + CLIQUE_B + BRIDGE + CHAIN


def _spark_communities(spark, edges, seeds, num_nodes, max_steps=None):
    g = Graph.from_edge_list(spark, edges, num_nodes=num_nodes)
    out = gce_expand(g, seeds, max_steps=max_steps)
    comms = {s: set() for s in seeds}
    for r in out.collect():
        comms[r["seed"]].add(r["node"])
    return comms


def test_gce_clique_seed_matches_reference(spark):
    comms = _spark_communities(spark, TWO_CLIQUES, [0, 7], 12, max_steps=None)
    for s in (0, 7):
        assert comms[s] == gce_reference(TWO_CLIQUES, s)


def test_gce_recovers_clique(spark):
    comms = _spark_communities(spark, TWO_CLIQUES, [0], 12, max_steps=None)
    assert {0, 1, 2, 3, 4}.issubset(comms[0])


def test_gce_step_bound_prefix(spark):
    """max_steps=k is exactly the first k additions of the unbounded run."""
    full = gce_reference(TWO_CLIQUES, 0)
    for k in (1, 2, 3):
        comms = _spark_communities(spark, TWO_CLIQUES, [0], 12, max_steps=k)
        assert len(comms[0]) == min(k + 1, len(full))
        assert comms[0] == gce_reference(TWO_CLIQUES, 0, max_steps=k)


def test_gce_tie_break_highest_id(spark):
    """Star from the seed: every leaf has identical dQ; the reference's
    ascending scan keeps the last (= highest) id."""
    star = [(0, i) for i in range(1, 6)]
    comms = _spark_communities(spark, star, [0], 6, max_steps=1)
    assert comms[0] == gce_reference(star, 0, max_steps=1) == {0, 5}


def test_gce_isolated_seed(spark):
    edges = [(0, 1), (1, 2)]
    comms = _spark_communities(spark, edges, [5], 6, max_steps=None)
    assert comms[5] == {5}


def test_gce_batched_equals_individual(spark):
    """All seeds in one batched run == each seed expanded alone."""
    seeds = [0, 5, 11]
    batched = _spark_communities(spark, TWO_CLIQUES, seeds, 12, max_steps=4)
    for s in seeds:
        assert batched[s] == gce_reference(TWO_CLIQUES, s, max_steps=4)
