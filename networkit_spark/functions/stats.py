"""Distribution statistics — reference ``networkit/stats.py`` analog.

The reference exposes a single function, ``gini(values)``
(_NetworKit.pyx:8879-8889): sort the values, accumulate the Lorenz area, and
return (fair_area - area) / fair_area. That driver-side sort is the one thing
a 100-TB engine cannot do; the closed form over ranks is exactly equivalent:

    G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n      (x sorted asc, i=1..n)

so the distributed job is the exact global rank (plans/order.zip_with_rank —
range shuffle + per-partition window, never one task) plus one aggregate.
Ties contribute the same sum under any rank order among equal values, so the
tie-break column only needs to be unique, not meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.order import zip_with_rank


def gini(df: DataFrame, value_col: str, tie_col: str) -> float:
    """Gini coefficient of ``df[value_col]`` (non-negative values;
    ``tie_col`` any unique column for a total order). Returns 0.0 for empty
    input or an all-zero distribution, matching the reference's convention
    that a perfectly equal distribution has G = 0."""
    ranked = zip_with_rank(
        df.select(value_col, tie_col),
        [F.col(value_col).asc(), F.col(tie_col).asc()],
        rank_col="_grank",
    )
    row = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("double")).alias("s"),
        F.sum(F.col("_grank") * F.col(value_col).cast("double")).alias("rs"),
    ).collect()[0]
    n, s, rs = row["n"], row["s"], row["rs"]
    if not n or not s:
        return 0.0
    return 2.0 * rs / (n * s) - (n + 1.0) / n
