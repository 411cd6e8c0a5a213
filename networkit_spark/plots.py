"""Plot-data products — the reference ``networkit/plot.py`` analog.

The reference's plot module (plot.py:15-76) computes a data series
driver-side and hands it to matplotlib/seaborn. Here each series is a
DISTRIBUTED DataFrame product (the reduction happens in Spark; only the
plot-sized result is small), and the optional rendering step is
import-gated on matplotlib exactly like the reference gates seaborn
(plot.py:5-12) — at 100 TB the series computation is the real work, and
every one of these reduces to one or two shuffles over already-implemented
operators.

Series functions (reference parity):
- degree_distribution      <- plot.degreeDistribution (plot.py:26)
- component_sizes_distribution <- plot.connectedComponentsSizes (plot.py:35)
- core_decomposition_sequence  <- plot.coreDecompositionSequence (plot.py:50)
- clustering_per_degree    <- plot.clusteringPerDegree (plot.py:59)
- hop_plot                 <- plot.hopPlot (plot.py:68)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import Graph


def degree_distribution(graph: Graph) -> DataFrame:
    """``(degree, cnt)`` — how many nodes have each degree, ascending.
    Reference plot.degreeDistribution builds the same histogram driver-side
    from ``properties.degreeSequence``."""
    return (
        graph.degrees()
        .groupBy("degree")
        .agg(F.count("*").alias("cnt"))
        .orderBy("degree")
    )


def component_sizes_distribution(graph: Graph) -> DataFrame:
    """``(size, cnt)`` — component-size histogram (reference
    plot.connectedComponentsSizes pie input, via ConnectedComponents)."""
    from .operators.components import component_sizes, connected_components

    sizes = component_sizes(connected_components(graph))
    return sizes.groupBy("size").agg(F.count("*").alias("cnt")).orderBy("size")


def core_decomposition_sequence(graph: Graph) -> DataFrame:
    """``(core, cnt)`` — shell-size histogram (reference
    plot.coreDecompositionSequence plots the sorted coreness sequence; the
    histogram is the same information at any scale)."""
    from .operators.kcore import coreness

    return (
        coreness(graph)
        .groupBy("core")
        .agg(F.count("*").alias("cnt"))
        .orderBy("core")
    )


def clustering_per_degree(graph: Graph) -> DataFrame:
    """``(degree, avg_lcc)`` — mean local clustering coefficient per degree
    (reference plot.clusteringPerDegree: degreeSequence × LocalClustering-
    Coefficient scores, seaborn-regressed; the grouped mean is the series)."""
    from .operators.triangles import local_clustering_coefficient

    lcc = local_clustering_coefficient(graph)
    return (
        graph.degrees()
        .join(lcc, "node")
        .groupBy("degree")
        .agg(F.avg("lcc").alias("avg_lcc"))
        .orderBy("degree")
    )


def hop_plot(graph: Graph, **kw) -> list:
    """[(h, N(h))] — reachable-pairs-within-h curve (reference plot.hopPlot
    via ANF.getHopPlot). Delegates to the ANF sketch machinery."""
    from .operators.distance import hop_plot_approx

    return hop_plot_approx(graph, **kw)


def render_series(df_or_rows, x: str, y: str, path: str, yscale: str = "linear"):
    """Render one series to ``path`` with matplotlib — import-gated the same
    way the reference gates seaborn (plot.py:5-12): the data products above
    work everywhere; rendering requires matplotlib to be installed."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - env without matplotlib
        raise ImportError(
            "matplotlib is required for rendering; the series DataFrames "
            "work without it"
        ) from e
    rows = (
        df_or_rows.collect() if isinstance(df_or_rows, DataFrame) else df_or_rows
    )
    if rows and isinstance(rows[0], (tuple, list)) and not hasattr(rows[0], "asDict"):
        # plain (x, y) pairs — hop_plot and the other list-returning series
        xs = [r[0] for r in rows]
        ys = [r[1] for r in rows]
    else:
        xs = [r[x] for r in rows]
        ys = [r[y] for r in rows]
    fig, ax = plt.subplots()
    ax.plot(xs, ys, marker="o")
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    ax.set_yscale(yscale)
    fig.savefig(path)
    plt.close(fig)
    return path
