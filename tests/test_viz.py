"""EPS drawing sink (reference cpp/viz/PostscriptWriter.cpp) + multilevel
layout (cpp/viz/MultilevelLayouter.cpp): structural checks by parsing the
emitted PostScript back."""

import os

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.graphlayout import multilevel_layout
from networkit_spark.sources.viz import write_eps, draw


@pytest.fixture()
def small_graph(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 4, 1.0), (4, 5, 1.0),
             (5, 3, 1.0), (0, 3, 1.0)]
    return Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )


def _parse(path):
    nodes, edges = 0, 0
    for line in open(path):
        if line.endswith(" n\n"):
            nodes += 1
        elif line.endswith(" e\n"):
            edges += 1
    return nodes, edges


def test_write_eps_counts(spark, small_graph, tmp_path):
    coords = spark.createDataFrame(
        [(i, float(i % 3), float(i // 3)) for i in range(6)],
        "node long, x double, y double",
    )
    out = str(tmp_path / "g.eps")
    write_eps(small_graph, coords, out)
    head = open(out).readline()
    assert head.startswith("%!PS-Adobe")
    nodes, edges = _parse(out)
    assert nodes == 6 and edges == 7
    # canvas bounds respected
    for line in open(out):
        if line.endswith(" n\n"):
            x, y = map(float, line.split()[:2])
            assert 0 <= x <= 1000 and 0 <= y <= 1000


def test_write_eps_cluster_colors(spark, small_graph, tmp_path):
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "node long, label long"
    )
    coords = spark.createDataFrame(
        [(i, float(i), float(i * i % 5)) for i in range(6)],
        "node long, x double, y double",
    )
    out = str(tmp_path / "c.eps")
    write_eps(small_graph, coords, out, clustering=labels)
    colors = {
        line.strip()
        for line in open(out)
        if line.endswith("setrgbcolor\n") and not line.startswith("0.7 0.7")
    }
    assert len(colors) == 2  # one color per cluster


def test_write_eps_max_nodes_guard(spark, small_graph, tmp_path):
    coords = spark.createDataFrame(
        [(i, 0.0, 0.0) for i in range(6)], "node long, x double, y double"
    )
    with pytest.raises(ValueError):
        write_eps(small_graph, coords, str(tmp_path / "x.eps"), max_nodes=3)


def test_multilevel_layout_places_all_nodes(spark):
    # two 8-cliques joined by a bridge: PLP coarsens, recursion prolongs
    edges = (
        [(i, j, 1.0) for i in range(8) for j in range(i + 1, 8)]
        + [(i, j, 1.0) for i in range(8, 16) for j in range(i + 1, 16)]
        + [(0, 8, 1.0)]
    )
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )
    pos = multilevel_layout(g, n_thresh=4, max_iter=10)
    rows = pos.collect()
    assert len(rows) == 16
    assert all(0.0 <= r["x"] <= 1.0 and 0.0 <= r["y"] <= 1.0 for r in rows)


def test_draw_end_to_end(spark, small_graph, tmp_path):
    out = str(tmp_path / "d.eps")
    draw(small_graph, out, layout="fr")
    nodes, edges = _parse(out)
    assert nodes == 6 and edges == 7
