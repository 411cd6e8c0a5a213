"""PivotMDS vs a NumPy full replica of the same pipeline (pivot choice,
raw-distance double-centering, power method with deflation)."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.graphlayout import pivot_mds

EDGES = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0),
         (5, 6, 1.0), (6, 7, 1.0), (0, 7, 1.0), (2, 6, 1.0)]
N = 8


def _hash60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replica(edges, n, dim, k, seed):
    pivots = sorted(range(n), key=lambda v: (_hash60(f"{v}:{seed}"), v))[:k]
    # dijkstra per pivot
    import heapq
    adj = [[] for _ in range(n)]
    for u, v, w in edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    D = np.zeros((n, k))
    for j, p in enumerate(pivots):
        dist = [np.inf] * n
        dist[p] = 0.0
        pq = [(0.0, p)]
        while pq:
            du, u = heapq.heappop(pq)
            if du > dist[u]:
                continue
            for v, w in adj[u]:
                if du + w < dist[v]:
                    dist[v] = du + w
                    heapq.heappush(pq, (dist[v], v))
        D[:, j] = dist
    rm = D.mean(axis=1, keepdims=True)
    cm = D.mean(axis=0, keepdims=True)
    grand = rm.sum() / (2.0 * n) + cm.sum() / (2.0 * k)
    C = D - rm - cm + grand
    CC = C.T @ C
    rng = np.random.RandomState(seed)
    coords = np.zeros((n, dim))
    for d in range(dim):
        v = 2.0 * rng.rand(k) - 1.0
        for _ in range(1500):
            old = v
            v = CC @ old
            v = v / np.linalg.norm(v)
            if np.linalg.norm(v - old) <= 1e-6:
                break
        lam = float(v @ (CC @ v)) / float(v @ v)
        coords[:, d] = C @ v
        CC = CC - (lam / float(v @ v)) * np.outer(v, v)
    return coords


def test_pivot_mds_matches_replica(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=N)
    got = pivot_mds(g, dim=2, num_pivots=4, seed=42)
    rows = {r["node"]: (r["x0"], r["x1"]) for r in got.collect()}
    want = _replica(EDGES, N, dim=2, k=4, seed=42)
    for v in range(N):
        assert abs(rows[v][0] - want[v, 0]) < 1e-6, v
        assert abs(rows[v][1] - want[v, 1]) < 1e-6, v
    # layout is non-degenerate: coordinates spread
    xs = np.array([rows[v][0] for v in range(N)])
    assert xs.std() > 1e-3
