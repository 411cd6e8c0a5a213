"""NetworkX interchange — parity with reference networkit/nxadapter.py
(nx2nk :17-45, nk2nx :48-70).

These are driver-side by nature (a networkx graph IS an in-memory object);
they exist for test fixtures and small-graph interchange, not as a scale
path — at scale use the distributed readers in sources/formats.py. Node ids
are mapped to consecutive integers in networkx node order, matching the
reference's idmap construction.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..graph import Graph

try:
    import networkx as _nx
except ImportError:  # pragma: no cover - optional dependency
    _nx = None


def _require_nx():
    if _nx is None:
        raise ImportError("networkx is required for nxadapter functions")


def from_networkx(spark: SparkSession, nxg, weight_attr: str | None = None) -> Graph:
    """nx2nk (reference nxadapter.py:17-45): map node ids to consecutive
    ints in node order; optional edge attribute as weight."""
    _require_nx()
    idmap = {nid: i for i, nid in enumerate(nxg.nodes())}
    weighted = weight_attr is not None
    rows = []
    for u, v, data in nxg.edges(data=True):
        w = float(data.get(weight_attr, 1.0)) if weighted else 1.0
        rows.append((idmap[u], idmap[v], w))
    directed = nxg.is_directed()
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    if not directed:
        edges = edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
    g = Graph(edges, directed=directed, weighted=weighted)
    # keep isolated nodes: idmap covers all nx nodes
    g._num_nodes = nxg.number_of_nodes()
    return g


def to_networkx(graph: Graph):
    """nk2nx (reference nxadapter.py:48-70): collect the edge DataFrame into
    a networkx graph (driver-side; small graphs only)."""
    _require_nx()
    nxg = _nx.DiGraph() if graph.directed else _nx.Graph()
    for r in graph.nodes().collect():
        nxg.add_node(int(r["node"]))
    for r in graph.edges.collect():
        if graph.weighted:
            nxg.add_edge(int(r["src"]), int(r["dst"]), weight=float(r["weight"]))
        else:
            nxg.add_edge(int(r["src"]), int(r["dst"]))
    return nxg
