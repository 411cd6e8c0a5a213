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


def _fr_replica(edges, n, iters, seed, prec=1e-3):
    """NumPy replica of fruchterman_reingold at grid=1 (exact all-pairs)."""
    pos = np.zeros((n, 2))
    for v in range(n):
        pos[v, 0] = _hash60(f"{v}:x:{seed}") / float(2 ** 60)
        pos[v, 1] = _hash60(f"{v}:y:{seed}") / float(2 ** 60)
    opt2 = 0.3 / n
    opt = opt2 ** 0.5
    sym = set()
    for u, v, _ in edges:
        sym.add((min(u, v), max(u, v)))
    step, cool = 1.0, 1.0
    for it in range(iters):
        f = np.zeros((n, 2))
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                d = pos[i] - pos[j]
                d2 = float(d @ d)
                if d2 > 0:
                    f[i] += d * opt2 / d2
        for u, v in sym:
            d = pos[u] - pos[v]
            dist = float(np.linalg.norm(d))
            f[u] -= d * dist / opt
            f[v] += d * dist / opt
        new = pos.copy()
        for i in range(n):
            ln = float(np.linalg.norm(f[i]))
            if ln > 0:
                new[i] = pos[i] + cool * f[i] / ln
            new[i] = np.clip(new[i], 0.0, 1.0)
        change = float(np.linalg.norm(new - pos, axis=1).sum())
        pos = new
        step += 0.1
        cool = 1.0 / step
        if change < prec:
            break
    return pos


def test_fruchterman_reingold_matches_replica(spark):
    from networkit_spark.operators.graphlayout import fruchterman_reingold

    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=N)
    got = fruchterman_reingold(g, max_iter=5, grid=1, seed=42)
    rows = {r["node"]: (r["x"], r["y"]) for r in got.collect()}
    want = _fr_replica(EDGES, N, iters=5, seed=42)
    for v in range(N):
        assert abs(rows[v][0] - want[v, 0]) < 1e-9, v
        assert abs(rows[v][1] - want[v, 1]) < 1e-9, v
    # grid approximation stays in the unit square and is deterministic
    g2 = fruchterman_reingold(g, max_iter=3, grid=2, seed=42)
    r2 = {r["node"]: (r["x"], r["y"]) for r in g2.collect()}
    assert all(0.0 <= x <= 1.0 and 0.0 <= y <= 1.0 for x, y in r2.values())
    r2b = {
        r["node"]: (r["x"], r["y"])
        for r in fruchterman_reingold(g, max_iter=3, grid=2, seed=42).collect()
    }
    assert r2 == r2b
