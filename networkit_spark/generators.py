"""Deterministic graph generators (reference: cpp/generators/, Python
networkit/generators.py). Every generator derives randomness from
``xxhash64(index, seed)`` so output is a pure function of the parameters —
no ``rand()`` tied to task scheduling, fully reproducible under AQE/replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import Graph

_U53 = 2 ** 53


def _uniform(*cols) -> F.Column:
    """Deterministic Uniform(0,1) from hashed columns."""
    return (F.abs(F.xxhash64(*cols)) % F.lit(_U53)).cast("double") / F.lit(float(_U53))


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> Graph:
    """G(n, p) via per-pair Bernoulli on hash(i, j, seed)
    (reference ErdosRenyiGenerator.h:20-39 uses sequential skip-sampling —
    inherently serial; the distributed analog enumerates the pair space,
    fine for fixture sizes, O(n²) rows). Use :func:`rmat` for scale."""
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
    )
    pairs = pairs.filter(
        F.col("src") != F.col("dst") if directed else F.col("src") < F.col("dst")
    )
    edges = pairs.filter(
        _uniform("src", "dst", F.lit(seed)) < p
    ).withColumn("weight", F.lit(1.0))
    return Graph(edges, directed=directed, weighted=False, num_nodes=n)


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
    num_partitions: int | None = None,
) -> Graph:
    """R-MAT power-law generator (reference cpp/generators/RmatGenerator.cpp;
    web-like defaults per FIXTURES.md §8): 2^scale nodes,
    edge_factor·2^scale edges. Per edge index e and recursion level l the
    quadrant comes from hash(e, l, seed) — a pure projection over
    ``spark.range(m)``: embarrassingly parallel, zero shuffle, O(scale)
    JVM-side ops per edge. Self-loops kept, multi-edges collapsed by weight.
    """
    n = 2 ** scale
    m = edge_factor * n
    df = spark.range(0, m, 1, num_partitions or spark.sparkContext.defaultParallelism)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        r = _uniform("id", F.lit(level), F.lit(seed))
        sbit = F.when(r < a + b, 0).otherwise(1)
        dbit = F.when(
            (r < a) | ((r >= a + b) & (r < a + b + c)), 0
        ).otherwise(1)
        src = src * 2 + sbit
        dst = dst * 2 + dbit
    edges = (
        df.select(src.alias("u"), dst.alias("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return Graph(edges, directed=False, weighted=True, num_nodes=n)


def clustered_random(
    spark: SparkSession,
    n: int,
    k: int,
    p_in: float = 1.0,
    p_out: float = 0.0,
    seed: int = 42,
) -> Graph:
    """ClusteredRandomGraphGenerator analog (used by the reference PLP tests,
    CommunityGTest.cpp:68-106): node i belongs to cluster i % k; pair (i,j)
    is an edge w.p. p_in within a cluster, p_out across."""
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
        .filter(F.col("src") < F.col("dst"))
    )
    same = (F.col("src") % k) == (F.col("dst") % k)
    u = _uniform("src", "dst", F.lit(seed))
    edges = pairs.filter(
        (same & (u < p_in)) | (~same & (u < p_out))
    ).withColumn("weight", F.lit(1.0))
    return Graph(edges, directed=False, weighted=False, num_nodes=n)


def barabasi_albert_like(
    spark: SparkSession, n: int, attach: int = 4, seed: int = 42
) -> Graph:
    """Preferential-attachment-flavored power-law graph
    (BarabasiAlbertGenerator analog). True BA is sequential; the
    deterministic distributed analog attaches node i to ``attach`` targets
    drawn ∝ 1/rank via an inverse-power transform of hash(i, j, seed) —
    reproduces the heavy-tailed in-degree profile without sequential state."""
    df = spark.range(1, n).withColumnRenamed("id", "src")
    targets = df.select(
        "src",
        F.explode(F.sequence(F.lit(0), F.lit(attach - 1))).alias("j"),
    )
    u = _uniform("src", "j", F.lit(seed))
    # target rank ~ floor(src^(u)) — earlier nodes get polynomially more mass
    tgt = F.floor(F.pow(F.col("src").cast("double"), u)).cast("long") % F.col("src")
    edges = (
        targets.select("src", tgt.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges, directed=False, weighted=False, num_nodes=n)


def hub_skew_graph(
    spark: SparkSession, n: int, m: int, hub_fraction: float = 0.05, seed: int = 42
) -> Graph:
    """Skew fixture (FIXTURES.md §8): one hub node receives ``hub_fraction``
    of all edges; the rest are uniform random. Exercises salting /
    high-degree splitting and AQE skew handling."""
    df = spark.range(m)
    u = _uniform("id", F.lit(seed))
    src = (F.abs(F.xxhash64("id", F.lit(seed + 1))) % F.lit(n)).cast("long")
    rnd_dst = (F.abs(F.xxhash64("id", F.lit(seed + 2))) % F.lit(n)).cast("long")
    dst = F.when(u < hub_fraction, F.lit(0).cast("long")).otherwise(rnd_dst)
    edges = (
        df.select(src.alias("u"), dst.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return Graph(edges, directed=False, weighted=True, num_nodes=n)
