"""Raster reader + geometric range graph (reference cpp/io/RasterReader.cpp,
PubWebGenerator neighbor-cap semantics)."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.raster import geometric_graph, read_raster_points

HEADER = (
    "ncols         {c}\n"
    "nrows         {r}\n"
    "xllcorner     0.0\n"
    "yllcorner     0.0\n"
    "cellsize      1.0\n"
    "NODATA_value  -9999\n"
)


def _write(tmp_path, grid):
    r, c = len(grid), len(grid[0])
    p = tmp_path / "pop.asc"
    body = "\n".join(" ".join(str(v) for v in row) for row in grid)
    p.write_text(HEADER.format(c=c, r=r) + body + "\n")
    return str(p)


def test_point_counts_match_cells(spark, tmp_path):
    grid = [[2, 0, 1], [0, 3, 0]]
    path = _write(tmp_path, grid)
    pts = read_raster_points(spark, path).collect()
    assert len(pts) == 6  # 2 + 1 + 3
    # per-cell counts and in-cell bounds; row 0 is the TOP row
    # (RasterReader.cpp:57-101): y in [nrows-1-row, nrows-row)
    by_cell = {}
    for p in pts:
        col, rowy = math.floor(p["x"]), p["y"]
        row = 2 - math.ceil(rowy)
        by_cell[(row, col)] = by_cell.get((row, col), 0) + 1
        assert 0.0 <= p["x"] < 3.0 and 0.0 <= p["y"] <= 2.0
    assert by_cell == {(0, 0): 2, (0, 2): 1, (1, 1): 3}


def test_normalization_factor_scales(spark, tmp_path):
    path = _write(tmp_path, [[10, 4]])
    pts = read_raster_points(spark, path, normalization_factor=0.5)
    assert pts.count() == 5 + 2


def test_points_deterministic(spark, tmp_path):
    path = _write(tmp_path, [[3, 1], [2, 0]])
    a = sorted((r["point_id"], r["x"], r["y"]) for r in read_raster_points(spark, path).collect())
    b = sorted((r["point_id"], r["x"], r["y"]) for r in read_raster_points(spark, path).collect())
    assert a == b


def test_geometric_graph_range(spark):
    # 4 points on a line, spacing 1.0: radius 1.5 links consecutive pairs
    pts = spark.createDataFrame(
        [(i, float(i), 0.0) for i in range(4)], "point_id long, x double, y double"
    )
    g = geometric_graph(pts, radius=1.5)
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(0, 1), (1, 2), (2, 3)}
    w = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert all(v == pytest.approx(1.0) for v in w.values())


def test_geometric_graph_cross_cell(spark):
    # a pair straddling a cell boundary is still found (8-neighbor probe)
    pts = spark.createDataFrame(
        [(0, 0.95, 0.5), (1, 1.05, 0.5)], "point_id long, x double, y double"
    )
    g = geometric_graph(pts, radius=1.0)
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1)}


def test_geometric_graph_max_degree(spark):
    # star: center 0 near three satellites; satellites also near each other?
    pts = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 0.4, 0.0), (2, -0.4, 0.0), (3, 0.0, 0.4)],
        "point_id long, x double, y double",
    )
    full = geometric_graph(pts, radius=1.0)
    assert full.edges.count() == 6  # all pairs within radius
    capped = geometric_graph(pts, radius=1.0, max_degree=2)
    deg = (
        capped.sym().groupBy("src").count().agg(F.max("count")).collect()[0][0]
    )
    assert deg <= 2
    # the closest pairs survive the mutual cap
    got = {(r["src"], r["dst"]) for r in capped.edges.collect()}
    assert (0, 1) in got and (0, 2) in got


def test_raster_to_graph_end_to_end(spark, tmp_path):
    path = _write(tmp_path, [[4, 0], [0, 4]])
    pts = read_raster_points(spark, path)
    g = geometric_graph(pts, radius=0.8)
    # all edges respect the radius
    assert g.edges.filter(F.col("weight") > 0.8).count() == 0
    assert g.num_nodes() <= 8
