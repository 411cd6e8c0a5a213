"""Drawing-task data products — reference ``networkit/viztasks.py`` analog.

The reference's viztasks are thin compositions that feed networkx.draw:
``drawGraph`` (viztasks.py:20-28) scales node sizes 30..300 by normalized
degree centrality, ``drawCommunityGraph`` (viztasks.py:30-42) coarsens by a
partition and scales community-node sizes 30..500 by community size, and
``coloringToColorList`` (viztasks.py:8-18) maps a coloring to [0,1] floats.

Spark split: the size/color SERIES are DataFrames (the computation — the
part that must scale); the matplotlib/networkx rendering is import-gated
and driver-side, exactly like plots.render_series and sources/viz.draw —
you render a layout sample, not 10^9 nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import Graph
from .operators.community import coarsen


def draw_graph_data(graph: Graph) -> DataFrame:
    """(node, size): ``30 + 270 * normalized degree`` (viztasks.py:20-28;
    DegreeCentrality normalization is score/maximum() with
    maximum() = n - 1, DegreeCentrality.cpp:28-40)."""
    n = graph.num_nodes()
    denom = float(max(n - 1, 1))
    return graph.degrees().select(
        "node",
        (F.lit(30.0) + F.lit(270.0) * F.col("degree") / F.lit(denom)).alias(
            "size"
        ),
    )


def draw_community_graph_data(graph: Graph, labels: DataFrame):
    """(coarse Graph, sizes DataFrame): drawCommunityGraph (viztasks.py:30-42)
    — coarsen by the partition (ParallelPartitionCoarsening analog), size
    each community node ``30 + 470 * |C| / max|C|``. Sizes are
    (label, size); the coarse graph's nodes are the labels."""
    coarse = coarsen(graph, labels)
    counts = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    mx = counts.agg(F.max("cnt")).collect()[0][0] or 1
    sizes = counts.select(
        "label",
        (F.lit(30.0) + F.lit(470.0) * F.col("cnt") / F.lit(float(mx))).alias(
            "size"
        ),
    )
    return coarse, sizes


def coloring_to_color_list(coloring: DataFrame) -> DataFrame:
    """(node, color): color id normalized by the number of colors
    (viztasks.py:8-18) — feed to a colormap. ``coloring`` is (node, color)
    as produced by operators/coloring.py."""
    k = coloring.agg(F.countDistinct("color")).collect()[0][0] or 1
    return coloring.select(
        "node", (F.col("color").cast("double") / F.lit(float(k))).alias("color")
    )


def draw_graph(graph: Graph, max_nodes: int = 2000, **kwargs):
    """Render via networkx like the reference (viztasks.py:20-28) — gated:
    needs networkx/matplotlib on the driver; refuses silently large graphs
    (sample or coarsen first, this is a drawing task not a sink)."""
    import networkx  # noqa: F401 — import-gated optional dependency

    if graph.num_nodes() > max_nodes:
        raise ValueError(
            f"draw_graph renders at most {max_nodes} nodes — sample or "
            "coarsen first (sources/viz.draw has the same guard)"
        )
    from .sources.nxadapter import to_networkx

    nxg = to_networkx(graph)
    if "node_size" not in kwargs:  # reference guards the same way before
        # computing (viztasks.py:26) — don't run the size job to discard it
        sizes = {
            r["node"]: r["size"] for r in draw_graph_data(graph).collect()
        }
        # default 30.0 = the zero-degree size: to_networkx can surface edge
        # endpoints the node table missed when num_nodes was given too small
        kwargs["node_size"] = [sizes.get(v, 30.0) for v in nxg.nodes()]
    networkx.draw(nxg, **kwargs)


def draw_community_graph(
    graph: Graph, labels: DataFrame, max_nodes: int = 2000, **kwargs
):
    """drawCommunityGraph rendering path (viztasks.py:30-42), import-gated.
    Refuses partitions with more than ``max_nodes`` communities — same
    driver-side rendering guard as :func:`draw_graph` (a near-singleton
    partition would otherwise collect the whole graph onto the driver)."""
    import networkx  # noqa: F401

    n_comm = labels.select("label").distinct().count()
    if n_comm > max_nodes:
        raise ValueError(
            f"draw_community_graph renders at most {max_nodes} communities "
            f"(partition has {n_comm}) — coarsen or merge first"
        )
    coarse, sizes = draw_community_graph_data(graph, labels)
    from .sources.nxadapter import to_networkx

    nxg = to_networkx(coarse)
    if "node_size" not in kwargs:
        smap = {r["label"]: r["size"] for r in sizes.collect()}
        kwargs["node_size"] = [smap.get(v, 30.0) for v in nxg.nodes()]
    networkx.draw(nxg, **kwargs)
