"""Profile suite runner — one call composing the reference's default
measure set over a shared cached graph, with an aggregate edges/s report.

Reference: networkit/profiling/profiling.py:230-301 — the Profile.create
measure set (Degree, CoreDecomposition, LocalClusteringCoefficient,
PageRank, KPathCentrality, Katz, ApproxBetweenness2(10), ApproxCloseness(10),
PLM communities, ConnectedComponents) and the closing
"total speed: X edges/s" line (profiling.py:296-301).

Spark shape: the symmetric adjacency is persisted ONCE and every measure's
plan reuses it (the profile is the one workload where cross-operator cache
reuse pays — each measure alone would rescan the edge table); per-measure
wall time and the suite-level edges/s aggregate are returned as plain dicts
so callers (bench, notebooks) can log them. Measures run sequentially like
the reference — each is internally distributed.
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import functions as F

from .graph import Graph

# (name, callable(graph) -> DataFrame-or-scalar) — defaults mirror
# profiling.py:266-289; sample sizes follow the reference's (G, 10, True)
DEFAULT_SAMPLES = 10


def profile(
    graph: Graph,
    measures: Optional[list[str]] = None,
    num_samples: int = DEFAULT_SAMPLES,
    seed: int = 42,
) -> dict:
    """Run the default measure suite; returns
    ``{"measures": {name: {"seconds": s, "rows": n}}, "total_seconds": t,
    "edges_per_sec": m/t, "nodes": n, "edges": m}``.

    ``measures`` optionally restricts to a subset of the measure names.
    """
    from .operators.centrality import (
        approx_betweenness,
        approx_closeness,
        degree_centrality,
        kpath_centrality,
    )
    from .operators.community import plp
    from .operators.components import connected_components
    from .operators.kcore import coreness
    from .operators.pagerank import katz_centrality, pagerank
    from .operators.plm import plm
    from .operators.triangles import local_clustering_coefficient
    from .operators.webstructure import powerlaw_alpha

    suite = {
        "degree": lambda g: degree_centrality(g),
        "coreness": lambda g: coreness(g),
        "lcc": lambda g: local_clustering_coefficient(g),
        "pagerank": lambda g: pagerank(g, tol=1e-8),
        "kpath": lambda g: kpath_centrality(g, seed=seed),
        "katz": lambda g: katz_centrality(g),
        "approx_betweenness": lambda g: approx_betweenness(
            g, num_samples=num_samples, seed=seed
        ),
        "approx_closeness": lambda g: approx_closeness(
            g, num_samples=num_samples, seed=seed
        ),
        "plm": lambda g: plm(g),
        "plp": lambda g: plp(g),
        "connected_components": lambda g: connected_components(g),
        # the reference profile's degree-distribution power-law fit
        # (networkit/profiling/stat.py gamma) — scalar measure
        "powerlaw_gamma": lambda g: powerlaw_alpha(g),
    }
    if measures is not None:
        unknown = set(measures) - set(suite)
        if unknown:
            raise ValueError(f"unknown profile measures: {sorted(unknown)}")
        suite = {k: v for k, v in suite.items() if k in measures}

    # share one cached adjacency across every measure
    graph.edges.persist()
    m = graph.num_edges()
    n = graph.num_nodes()

    out: dict = {"measures": {}, "nodes": n, "edges": m}
    t_all = time.time()
    try:
        for name, fn in suite.items():
            t0 = time.time()
            res = fn(graph)
            entry = {"seconds": None}
            if hasattr(res, "count"):
                entry["rows"] = int(res.count())
            else:
                entry["value"] = float(res)
            entry["seconds"] = round(time.time() - t0, 3)
            out["measures"][name] = entry
        total = time.time() - t_all
        out["total_seconds"] = round(total, 3)
        # the reference's aggregate metric (profiling.py:301)
        out["edges_per_sec"] = round(m / total, 1) if total > 0 else float("inf")
    finally:
        # release the shared cache even when a measure raises — a long-lived
        # session otherwise accumulates stale cached edge copies per attempt
        graph.edges.unpersist()
    return out


def profile_report(result: dict) -> str:
    """Human-readable block mirroring the reference's verbose print."""
    lines = [f"profile: {result['nodes']} nodes, {result['edges']} edges"]
    for name, r in result["measures"].items():
        tail = f"({r['rows']} rows)" if "rows" in r else f"= {r['value']:.4f}"
        lines.append(f"  {name:22s} {r['seconds']:8.2f} s  {tail}")
    lines.append(
        f"total time: {result['total_seconds']:.2f} s — "
        f"total speed: {result['edges_per_sec']:.1f} edges/s"
    )
    return "\n".join(lines)
