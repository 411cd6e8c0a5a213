"""Raster → point cloud → geometric graph (reference cpp/io/RasterReader.cpp
+ the PubWebGenerator-style range-graph construction it feeds).

RasterReader.cpp:21-104 parses an ESRI ASCII grid (6 header lines: ncols,
nrows, then 4 ignored), multiplies every cell value by a normalization
factor, and emits ``round(value)`` uniform-random points inside that cell's
unit square on a [0, ncols] × [0, nrows] canvas (y runs top-down: row 0 is
the TOP row).

Spark shape: the grid body is read as a text DataFrame (one row per raster
row, deterministically indexed by zipWithIndex — line order in a text split
is stable), cells come from ``posexplode`` of the whitespace split, and the
per-cell point fan-out is ``explode(sequence(1, n))`` — all JVM-side; a
100k×100k population raster never touches the driver.  Determinism
deviation (repo convention, like generators.py): in-cell jitter is the
seeded md5 hash of (row, col, i), not a global RNG.

``geometric_graph`` then links points within ``radius`` via the standard
spatial-hash cell join (cell + 8 neighbors — same cutoff pattern as the
Fruchterman-Reingold grid in operators/graphlayout.py), never an all-pairs
cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dedup import hash60
from ..graph import Graph

_HSPACE = float(2**60)


def _u01(*cols) -> F.Column:
    return hash60(F.concat_ws(":", *[c.cast("string") for c in cols])) / F.lit(_HSPACE)


def read_raster_points(
    spark: SparkSession,
    path: str,
    normalization_factor: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Returns (point_id, x, y) — RasterReader::read parity: one point per
    ``round(cell_value * normalization_factor)``, uniformly jittered inside
    the cell; x in [col, col+1), y in [nrows-1-row, nrows-row) (row 0 on
    top, RasterReader.cpp:57-101). ``path`` must be a single .asc file (the
    ESRI format interleaves a 6-line header with the grid, so a multi-file
    glob has no well-defined header)."""
    indexed = (
        spark.read.text(path)
        .rdd.zipWithIndex()
        .map(lambda t: (t[0]["value"], t[1]))
        .toDF(["line", "idx"])
        .persist()
    )
    # header through the SAME Spark reader as the body — a driver-local
    # open() would reject every path only Spark can reach (hdfs://, s3a://)
    header = [
        r["line"]
        for r in indexed.filter(F.col("idx") < 6).orderBy("idx").collect()
    ]
    # header lines are "ncols <value>" / "nrows <value>" (the reference
    # skips a fixed 14-char prefix, RasterReader.cpp:36-48; token-split is
    # the same value, robust to width)
    ncols = int(float(header[0].split()[-1]))
    nrows = int(float(header[1].split()[-1]))

    lines = indexed.filter(F.col("idx") >= 6).select(
        "line", (F.col("idx") - 6).alias("row")
    )
    cells = lines.select(
        "row",
        F.posexplode(F.split(F.trim("line"), r"\s+")).alias("col", "val"),
    ).select(
        "row",
        "col",
        F.round(F.col("val").cast("double") * F.lit(normalization_factor))
        .cast("long")
        .alias("n_pts"),
    ).filter(F.col("n_pts") > 0)
    pts = cells.select(
        "row", "col", F.explode(F.sequence(F.lit(1), F.col("n_pts"))).alias("i")
    )
    # collision-free ids for ANY per-cell point count: stride by the cell
    # count (id = (i-1)*ncells + cell_index) instead of packing i into a
    # fixed bit width — a 2^20-point cell would otherwise spill into the
    # next cell's id range. Guard the i*ncells product against 63-bit
    # overflow explicitly.
    ncells = nrows * ncols
    max_pts = cells.agg(F.max("n_pts")).collect()[0][0] or 0
    if max_pts * ncells >= 2**63:
        raise ValueError(
            f"read_raster_points: {max_pts} points in one cell x {ncells} "
            "cells overflows 63-bit point ids — lower normalization_factor"
        )
    # header + guard jobs are done; release the text cache (the lazy result
    # below re-scans the file once on consumption instead of pinning it)
    indexed.unpersist()
    sseed = F.lit(seed)
    return pts.select(
        (
            (F.col("i") - 1) * F.lit(ncells)
            + (F.col("row") * ncols + F.col("col"))
        ).alias("point_id"),
        (F.col("col") + _u01(F.col("row"), F.col("col"), F.col("i"), F.lit("x"), sseed)).alias("x"),
        (
            F.lit(float(nrows))
            - F.col("row")
            - _u01(F.col("row"), F.col("col"), F.col("i"), F.lit("y"), sseed)
        ).alias("y"),
    )


def geometric_graph(
    points: DataFrame, radius: float, max_degree: int | None = None
) -> Graph:
    """Range graph over (point_id, x, y): an edge for every pair within
    ``radius`` (Euclidean), optionally capped at ``max_degree`` nearest
    neighbors per point (PubWebGenerator.cpp's maxNumberOfNeighbors
    semantics: keep the closest ones).

    Spatial-hash join: bucket points into radius-sized cells, join each
    point against its cell + 8 neighbors, filter by true distance — O(n·k)
    pairs for bounded density, shuffle keyed by cell."""
    cell = points.select(
        "point_id",
        "x",
        "y",
        F.floor(F.col("x") / radius).cast("long").alias("cx"),
        F.floor(F.col("y") / radius).cast("long").alias("cy"),
    )
    spark = points.sparkSession
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    probe = cell.crossJoin(F.broadcast(offsets)).select(
        "point_id",
        "x",
        "y",
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    right = cell.select(
        F.col("point_id").alias("pid2"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
        "cx",
        "cy",
    )
    d2 = (F.col("x") - F.col("x2")) ** 2 + (F.col("y") - F.col("y2")) ** 2
    pairs = (
        probe.join(right, ["cx", "cy"])
        .filter(F.col("point_id") < F.col("pid2"))
        .filter(d2 <= F.lit(radius * radius))
        .select(
            F.col("point_id").alias("src"),
            F.col("pid2").alias("dst"),
            F.sqrt(d2).alias("weight"),
        )
    )
    if max_degree is not None:
        from pyspark.sql import Window

        sym = pairs.unionByName(
            pairs.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        w = Window.partitionBy("src").orderBy("weight", "dst")
        kept = (
            sym.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= max_degree)
            .select("src", "dst", "weight")
        )
        # an edge survives only if BOTH endpoints keep it (mutual-kNN, the
        # symmetric reading of the reference's neighbor cap)
        pairs = (
            kept.filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .join(
                kept.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ).distinct(),
                ["src", "dst"],
            )
            .join(pairs, ["src", "dst"])
            .select("src", "dst", "weight")
        )
    return Graph(pairs, directed=False, weighted=True)
