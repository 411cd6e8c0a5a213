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
