"""Plot-data series (networkit_spark/plots.py) — reference networkit/plot.py
analog: each series is a distributed DataFrame reduction; rendering is
matplotlib-import-gated like the reference's seaborn gate (plot.py:5-12)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plots import (
    clustering_per_degree,
    component_sizes_distribution,
    core_decomposition_sequence,
    degree_distribution,
    hop_plot,
    render_series,
)

# two triangles sharing node 2, plus a pendant and an isolated node
EDGES = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5)]
N = 7  # node 6 isolated


@pytest.fixture(scope="module")
def g(spark):
    return Graph.from_edge_list(spark, EDGES, num_nodes=N)


def test_degree_distribution(g):
    got = {r.degree: r.cnt for r in degree_distribution(g).collect()}
    # degrees: 0:2 1:2 2:4 3:2 4:3 5:1 6:0 -> hist {0:1, 1:1, 2:3, 3:1, 4:1}
    assert got == {0: 1, 1: 1, 2: 3, 3: 1, 4: 1}


def test_component_sizes_distribution(g):
    got = {r.size: r.cnt for r in component_sizes_distribution(g).collect()}
    assert got == {1: 1, 6: 1}


def test_core_decomposition_sequence(g):
    got = {r.core: r.cnt for r in core_decomposition_sequence(g).collect()}
    # isolated node 6 core 0; pendant 5 core 1; triangle members core 2
    assert got == {0: 1, 1: 1, 2: 5}


def test_clustering_per_degree(g):
    got = {r.degree: r.avg_lcc for r in clustering_per_degree(g).collect()}
    # degree-2 nodes 0,1,3: lcc 1 each; node4 (deg 3) and node2 (deg 4): 1/3
    assert got[2] == pytest.approx(1.0)
    assert got[3] == pytest.approx(1.0 / 3)
    assert got[4] == pytest.approx(1.0 / 3)
    assert got[0] == 0.0 and got[1] == 0.0


def test_hop_plot_monotone(g):
    pts = hop_plot(g)
    assert pts[0][0] <= pts[-1][0]
    vals = [v for _, v in pts]
    assert all(b >= a for a, b in zip(vals, vals[1:]))


def test_render_series_gated(g, tmp_path):
    rows = degree_distribution(g).collect()
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            render_series(rows, "degree", "cnt", str(tmp_path / "d.png"))
    else:
        out = render_series(rows, "degree", "cnt", str(tmp_path / "d.png"))
        import os

        assert os.path.getsize(out) > 0
