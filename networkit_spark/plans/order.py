"""Distributed total-order ranking — the scale-safe replacement for
``row_number().over(Window.orderBy(...))`` (which funnels the whole dataset
through ONE task).

Physical plan (the classic distributed dense-rank):
  1. ``repartitionByRange`` on the order keys — a distributed range shuffle;
     partition i holds keys strictly before partition i+1's.
  2. materialize once (persist + count) so the sampled range boundaries are
     FIXED for both downstream jobs (otherwise the count job and the rank job
     could re-sample different boundaries and disagree),
  3. per-partition counts (+ optional partial sums) → driver: ``P`` rows,
     cumulative exclusive offsets,
  4. ``row_number`` / running sums over ``Window.partitionBy(partition_id)``
     — each task sorts only its own range — plus the broadcast offset join.

The resulting rank is the exact global rank and is partitioning-independent
as long as the order keys are a total order (callers must include a unique
tie-break column). At cluster scale replace the persist with a checkpoint
for executor-loss safety; the offsets table is O(#partitions).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def zip_with_rank(
    df: DataFrame,
    order_cols: Sequence,
    rank_col: str = "rank",
    cum_cols: Sequence[str] = (),
    num_partitions: Optional[int] = None,
    cache_handle: Optional[list] = None,
) -> DataFrame:
    """Adds ``rank_col`` (1-based exact global rank under ``order_cols``) and,
    for each name in ``cum_cols``, ``cum_<name>`` (inclusive running sum in
    rank order). ``order_cols`` are Column sort expressions (include a unique
    tie-break). Returns the input columns + the new ones; the input must not
    already contain ``_zpid``.

    The range-partitioned frame stays persisted (it pins the sampled range
    boundaries — unpersisting before the result is consumed would let the
    rank job resample different boundaries than the offset job). Callers
    that fully consume the result and want the cache back pass a list as
    ``cache_handle``; the persisted frame is appended for them to
    ``unpersist()`` afterwards.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]

    part = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_zpid", F.spark_partition_id())
        .persist()
    )
    part.count()  # pin the sampled range boundaries before both jobs below
    if cache_handle is not None:
        cache_handle.append(part)

    aggs = [F.count(F.lit(1)).alias("_zcnt")] + [
        F.sum(c).alias(f"_zsum_{c}") for c in cum_cols
    ]
    stats = sorted(part.groupBy("_zpid").agg(*aggs).collect(), key=lambda r: r["_zpid"])
    offsets, run_cnt = [], 0
    run_sums = {c: 0.0 for c in cum_cols}
    for r in stats:
        offsets.append((r["_zpid"], run_cnt, *[run_sums[c] for c in cum_cols]))
        run_cnt += r["_zcnt"]
        for c in cum_cols:
            run_sums[c] += r[f"_zsum_{c}"] or 0
    schema = "_zpid int, _zoff long" + "".join(
        f", _zoff_{c} double" for c in cum_cols
    )
    off_df = spark.createDataFrame(offsets or [], schema)

    w = Window.partitionBy("_zpid").orderBy(*cols)
    ranked = part.withColumn("_zrn", F.row_number().over(w))
    for c in cum_cols:
        ranked = ranked.withColumn(f"_zcs_{c}", F.sum(c).over(w))
    out = ranked.join(F.broadcast(off_df), "_zpid").withColumn(
        rank_col, (F.col("_zrn") + F.col("_zoff")).cast("long")
    )
    for c in cum_cols:
        out = out.withColumn(f"cum_{c}", F.col(f"_zcs_{c}") + F.col(f"_zoff_{c}"))
    drop = ["_zpid", "_zrn", "_zoff"] + [f"_zcs_{c}" for c in cum_cols] + [
        f"_zoff_{c}" for c in cum_cols
    ]
    return out.drop(*drop)


def zip_with_index(
    df: DataFrame,
    order_cols: Sequence,
    index_col: str = "index",
    num_partitions: Optional[int] = None,
    cache_handle: Optional[list] = None,
) -> DataFrame:
    """0-based exact global index under ``order_cols`` (dense-id assignment).
    ``cache_handle`` — see :func:`zip_with_rank`."""
    out = zip_with_rank(
        df,
        order_cols,
        rank_col=index_col,
        num_partitions=num_partitions,
        cache_handle=cache_handle,
    )
    return out.withColumn(index_col, F.col(index_col) - 1)
