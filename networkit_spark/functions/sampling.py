"""Deterministic sampling & splitting for training-data pipelines.

A 100-TB corpus job needs reproducible, partitioning-independent sampling:
the same (seed, row) always lands in the same sample/split regardless of
cluster size, task order, or retries. Spark's ``df.sample`` is seeded per
PARTITION, so a repartition changes the sample — unacceptable for dataset
lineage. Everything here keys off the portable 60-bit md5 content hash
(functions/dedup.py hash60), which both Spark and the DuckDB oracles can
compute bit-identically.

Ops:
- ``hash_split``: train/val/test assignment by hash ratio bands;
- ``sample_fraction``: Bernoulli sample at an exact hash threshold;
- ``sample_per_key``: top-n-by-hash within each key (stratified /
  per-domain capping — the dedup-adjacent "keep at most n docs per host"
  pipeline stage). Window is partitioned BY KEY — never a global sort.

Reference analog: none (NetworKit has no corpus sampling); this is part of
the training-pipeline surface the engine adds on top of §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import hash60

# hash60 values are uniform on [0, 2^60)
_HSPACE = float(2 ** 60)


def _unit_hash(col: Column, seed: int) -> Column:
    """Deterministic uniform double in [0, 1) from (value, seed)."""
    return hash60(F.concat_ws(":", col.cast("string"), F.lit(str(seed)))) / F.lit(
        _HSPACE
    )


def sample_fraction(
    df: DataFrame, fraction: float, on: str, seed: int = 42
) -> DataFrame:
    """Content-keyed Bernoulli sample: keeps rows with unit_hash < fraction.
    Reproducible across partitionings, cluster sizes, and retries (unlike
    ``df.sample``, whose seed is per-partition)."""
    return df.filter(_unit_hash(F.col(on), seed) < fraction)


def hash_split(
    df: DataFrame,
    on: str,
    weights: dict | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash band; bands are cumulative
    over the dict's insertion order. Default 98/1/1 train/val/test."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    u = _unit_hash(F.col(on), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < acc, F.lit(name))
        expr = branch if expr is None else expr.when(u < acc, F.lit(name))
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return df.withColumn(split_col, expr)


def sample_per_key(
    df: DataFrame, key: str, n: int, on: str, seed: int = 42
) -> DataFrame:
    """Keep the n rows with the smallest (hash, tiebreak) per key — the
    "at most n documents per domain" capping stage. The window partitions by
    ``key``: per-key work only, no global sort, skew bounded by the largest
    single key (cap hot domains upstream if a key exceeds executor memory)."""
    u = hash60(
        F.concat_ws(":", F.col(on).cast("string"), F.lit(str(seed)))
    )
    w = Window.partitionBy(key).orderBy(u.asc(), F.col(on).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
