"""In-test dense NumPy replicas of the reference algorithms.

These mirror the exact update rules of the reference C++ (cited per function)
so Spark results can be checked at tight tolerances on arbitrary fixtures,
not just the embedded golden vectors.
"""

from __future__ import annotations

import numpy as np


def numpy_pagerank(edges, n, directed=False, damp=0.85, tol=1e-9, max_iter=500):
    """Replica of /root/reference/networkit/cpp/centrality/PageRank.cpp:20-71:
    in-edge gather, weight/weightedDegree, L2 stop, final sum-1 normalize,
    no dangling redistribution."""
    W = np.zeros((n, n))
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        W[u, v] += w
        if not directed and u != v:
            W[v, u] += w
    wdeg = W.sum(axis=1)  # weighted out-degree
    P = np.divide(W, wdeg[:, None], out=np.zeros_like(W), where=wdeg[:, None] > 0)
    pr = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        new = damp * (P.T @ pr) + (1 - damp) / n
        if np.sqrt(((new - pr) ** 2).sum()) <= tol:
            pr = new
            break
        pr = new
    return pr / pr.sum()


def numpy_components(edges, n):
    """Min-member component labels (fixpoint of hash-to-min, the canonical
    form of ParallelConnectedComponents.cpp labels)."""
    label = np.arange(n)
    changed = True
    adj = [(int(u), int(v)) for u, v, *_ in [tuple(e) for e in edges]]
    while changed:
        changed = False
        for u, v in adj:
            m = min(label[u], label[v])
            if label[u] != m or label[v] != m:
                label[u] = label[v] = m
                changed = True
    # propagate to closure
    for _ in range(n):
        new = label[label]
        if (new == label).all():
            break
        label = new
    return label


def numpy_plp_sync(edges, n, iters, weighted=False):
    """Synchronous PLP with (max weight, min label) tie-break — the
    deterministic oracle pinned in SURVEY.md §5 (PLP.cpp:89-92 tie rule)."""
    W = np.zeros((n, n))
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if (weighted and len(e) > 2) else 1.0
        W[u, v] += w
        if u != v:
            W[v, u] += w
    label = np.arange(n)
    for _ in range(iters):
        new = label.copy()
        for u in range(n):
            nbrs = np.nonzero(W[u])[0]
            if len(nbrs) == 0:
                continue
            weights = {}
            for v in nbrs:
                weights[label[v]] = weights.get(label[v], 0.0) + W[u, v]
            best = max(weights.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[u] = best
        label = new
    return label


def numpy_triangle_counts(edges, n):
    """Per-node triangle participation counts (exact)."""
    A = np.zeros((n, n), dtype=bool)
    for e in edges:
        u, v = int(e[0]), int(e[1])
        if u == v:
            continue
        A[u, v] = A[v, u] = True
    tri = np.zeros(n, dtype=int)
    for u in range(n):
        nb = np.nonzero(A[u])[0]
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if A[nb[i], nb[j]]:
                    tri[u] += 1
    return tri


def python_scc(edges, n):
    """Iterative Tarjan (mirrors reference
    cpp/components/StronglyConnectedComponents.cpp:33-164), canonicalized to
    min-member labels: returns {node: min id of its SCC}."""
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
    index = {}
    low = {}
    on_stack = [False] * n
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])

    for v in range(n):
        if v not in index:
            strongconnect(v)
    return comp


def python_coreness(edges, n):
    """Sequential Batagelj–Zaveršnik peel (reference CoreDecomposition ParK
    semantics): returns {node: core number}."""
    nbrs = [set() for _ in range(n)]
    for u, v in edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    deg = {v: len(nbrs[v]) for v in range(n)}
    core = {}
    alive = set(range(n))
    k = 0
    while alive:
        k += 1
        while True:
            drop = [v for v in alive if deg[v] < k]
            if not drop:
                break
            for v in drop:
                core[v] = k - 1
                alive.discard(v)
                for w in nbrs[v]:
                    if w in alive:
                        deg[w] -= 1
    return core


def python_edmonds_karp(edges, n, source, sink):
    """Sequential Edmonds-Karp replica of reference
    cpp/flow/EdmondsKarp.cpp:18-95 on an undirected capacity graph.
    edges: list of (u, v, w). Returns (flow_value, source_set frozenset)."""
    from collections import deque

    cap = {}
    adj = [[] for _ in range(n)]
    for u, v, w in edges:
        u, v, w = int(u), int(v), float(w)
        cap[(u, v)] = cap.get((u, v), 0.0) + w
        cap[(v, u)] = cap.get((v, u), 0.0) + w
        adj[u].append(v)
        adj[v].append(u)
    flow_value = 0.0
    while True:
        pred = {source: source}
        gain = {source: float("inf")}
        q = deque([source])
        found = False
        while q and not found:
            u = q.popleft()
            for v in adj[u]:
                if v not in pred and cap.get((u, v), 0.0) > 1e-12:
                    pred[v] = u
                    gain[v] = min(gain[u], cap[(u, v)])
                    if v == sink:
                        found = True
                        break
                    q.append(v)
        if not found:
            return flow_value, frozenset(pred.keys())
        g = gain[sink]
        flow_value += g
        v = sink
        while v != source:
            u = pred[v]
            cap[(u, v)] -= g
            cap[(v, u)] = cap.get((v, u), 0.0) + g
            v = u
