"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, JVM-side
  zip_with/aggregate dot products, per-query window top-k. At 100 TB the
  scan side stays fully distributed; only the query set broadcasts.
- IVF-style variant: deterministic sign-bit coarse quantizer buckets the
  corpus; queries probe only matching buckets (single-probe) — the scale
  path that turns an O(N·Q) scan into O(N·Q / 2^bits) with recall traded
  for bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — exact top-k by cosine; deterministic
    tie-break by vec_id asc. Self-matches (same id) are excluded."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nv"),
    ).filter(F.col("nv") > 0)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nq"),
    ).filter(F.col("nq") > 0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def signbit_bucket(vec_col, bits: int = 8):
    """Deterministic coarse quantizer: integer code from the sign bits of the
    first ``bits`` dimensions."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    code = None
    for b in range(bits):
        bit = F.when(F.element_at(v, b + 1) >= 0, F.lit(2 ** b)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return code


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing the query's sign-bit
    bucket are scored (single-probe IVF). Same output schema as brute force."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nv"),
        signbit_bucket(vec_col, bits).alias("bucket"),
    ).filter(F.col("nv") > 0)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nq"),
        signbit_bucket(vec_col, bits).alias("bucket"),
    ).filter(F.col("nq") > 0)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )
