"""SEIR epidemic simulation vs a sequential replica of the synchronous sweep
(reference cpp/simulation/EpidemicSimulationSEIR.cpp semantics with the
documented deterministic per-(node,step) exposure draw)."""

import hashlib

from networkit_spark.graph import Graph
from networkit_spark.operators.simulation import seir_simulation

EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (2, 6), (6, 7),
         (7, 8), (4, 8), (0, 9)]


def _unit_hash(node, t, seed):
    h = hashlib.md5(f"{node}:{t}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) / float(2 ** 60)


def _replica(edges, n, t_max, trans_p, e_time, i_time, zero, seed):
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    state = ["S"] * n
    ts = [0] * n
    state[zero] = "I"
    out = []
    idx = {"S": 0, "E": 1, "I": 2, "R": 3}
    for t in range(t_max):
        contacted = set()
        for u in range(n):
            if state[u] == "I":
                contacted.update(adj[u])
        new_state, new_ts = state[:], ts[:]
        for v in range(n):
            if state[v] == "S" and v in contacted and _unit_hash(v, t, seed) <= trans_p:
                new_state[v], new_ts[v] = "E", t
            elif state[v] == "E" and t - ts[v] >= e_time:
                new_state[v], new_ts[v] = "I", t
            elif state[v] == "I" and t - ts[v] >= i_time:
                new_state[v], new_ts[v] = "R", t
        state, ts = new_state, new_ts
        for s_name, s_idx in idx.items():
            out.append((zero, t, s_idx, sum(1 for x in state if x == s_name)))
    return out


def test_seir_matches_replica(spark):
    g = Graph.from_edge_list(spark, EDGES, num_nodes=10)
    got = sorted(
        tuple(r) for r in seir_simulation(
            g, t_max=6, trans_p=0.5, e_time=1, i_time=2, zero=0, seed=7
        ).collect()
    )
    want = sorted(_replica(EDGES, 10, 6, 0.5, 1, 2, 0, 7))
    assert got == want
    # epidemic actually progressed: someone left S, someone reached R
    final_s = [r for r in want if r[1] == 5 and r[2] == 0][0][3]
    final_r = [r for r in want if r[1] == 5 and r[2] == 3][0][3]
    assert final_s < 10 and final_r > 0
