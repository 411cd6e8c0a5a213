"""Distributed weighted sampling — draw ``m`` independent items from a
weight column ∝ weight, without collecting the distribution to the driver.

Physical plan (bucketed inverse-CDF interval join):
  1. exact prefix sums of the weights via :func:`..plans.order.zip_with_rank`
     (range shuffle + per-partition running sums + broadcast offsets) give
     each item the half-open interval [cum_w - w, cum_w) on [0, S);
  2. trials are a pure projection over ``spark.range(m)`` — trial t draws
     x_t = hash-uniform(t, seed) · S;
  3. the interval lookup is a bucketed equi-join: bucket width = S / #items
     (≈ the mean weight), items explode into the ~(w/width + 1) buckets they
     overlap (total exploded rows ≈ 2·#items), trials join on their single
     bucket, and the exact containment filter keeps the one true match.

No broadcast of the distribution, no driver loop, no range join — two
shuffles total, both on near-uniform keys (heavy items span MORE buckets
instead of hotting one key, so skew self-corrects).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .order import zip_with_rank

_U53 = 2 ** 53


def _uniform(*cols) -> F.Column:
    return (F.abs(F.xxhash64(*cols)) % F.lit(_U53)).cast("double") / F.lit(float(_U53))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    m: int,
    seed: int = 42,
    trial_col: str = "trial",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """``m`` independent weighted draws (with replacement) from ``df``.

    Returns one row per trial: (``trial_col``, *df columns of the drawn
    item*). Deterministic in (df contents, seed): trial t's draw is a pure
    function of hash(t, seed) and the item intervals.
    """
    spark = df.sparkSession
    ranked = zip_with_rank(
        df, [F.col(weight_col).desc(), *[F.col(c) for c in df.columns if c != weight_col]],
        rank_col="_wsrank", cum_cols=[weight_col], num_partitions=num_partitions,
    )
    cum = f"cum_{weight_col}"
    items = ranked.select(
        *df.columns,
        (F.col(cum) - F.col(weight_col)).alias("_wlo"),
        F.col(cum).alias("_whi"),
    ).persist()
    row = items.agg(
        F.max("_whi").alias("total"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    total, n = float(row["total"] or 0.0), int(row["n"])
    if total <= 0 or m <= 0:
        items.unpersist()
        return spark.createDataFrame([], f"{trial_col} long").crossJoin(df.limit(0))
    width = total / max(n, 1)
    exploded = items.select(
        *df.columns, "_wlo", "_whi",
        F.explode(
            F.sequence(
                F.floor(F.col("_wlo") / F.lit(width)).cast("long"),
                F.least(
                    F.floor(F.col("_whi") / F.lit(width)),
                    F.lit(float(n - 1)),
                ).cast("long"),
            )
        ).alias("_wbkt"),
    )
    trials = spark.range(m).select(
        F.col("id").alias(trial_col),
        (_uniform("id", F.lit(seed)) * F.lit(total)).alias("_wx"),
    ).withColumn(
        "_wbkt",
        F.least(F.floor(F.col("_wx") / F.lit(width)), F.lit(float(n - 1))).cast("long"),
    )
    out = (
        trials.join(exploded, "_wbkt")
        .filter((F.col("_wx") >= F.col("_wlo")) & (F.col("_wx") < F.col("_whi")))
        .select(trial_col, *df.columns)
    )
    return out
