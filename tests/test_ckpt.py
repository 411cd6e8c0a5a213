"""clean_local_checkpoint (plans/ckpt.py): the stats-compounding guard.

``Dataset.localCheckpoint`` propagates the optimized plan's statistics onto
the checkpoint (``originStats``); in loops whose state frames join each
other the propagated ``sizeInBytes`` MULTIPLIES every round, its bit length
doubles, and Catalyst planning degenerates into million-bit BigInteger
multiplication (measured: the 11-node push-relabel fixture went from 1.5 s
to 360+ s per round by round 6). These tests pin both properties of the
fix: data fidelity and non-compounding stats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.plans.ckpt import clean_local_checkpoint


def _size_bits(df) -> int:
    spark = df.sparkSession
    return spark._jvm.java.math.BigInteger(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    ).bitLength()


def test_clean_ckpt_preserves_data_and_schema(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("x")
    )
    ck = clean_local_checkpoint(df)
    assert ck.schema == df.schema
    assert sorted(r["x"] for r in ck.collect()) == sorted(
        r["x"] for r in df.collect()
    )


def test_clean_ckpt_stats_do_not_compound(spark):
    """Self-joining loop: with plain localCheckpoint the stat's bit length
    roughly doubles per round; with the clean checkpoint it stays pinned at
    defaultSizeInBytes (63 bits) forever."""
    a = clean_local_checkpoint(
        spark.range(50).select(F.col("id").alias("k"), F.lit(1.0).alias("x"))
    )
    b = clean_local_checkpoint(
        spark.range(50).select(F.col("id").alias("k"), F.lit(2.0).alias("y"))
    )
    for _ in range(6):
        a2 = clean_local_checkpoint(
            a.join(b, "k").select("k", (F.col("x") + F.col("y")).alias("x"))
        )
        b2 = clean_local_checkpoint(
            b.join(a, "k").select("k", (F.col("y") + F.col("x")).alias("y"))
        )
        a, b = a2, b2
    assert _size_bits(a) <= 64
    assert a.count() == 50


def test_plain_ckpt_compounds_documenting_the_pathology(spark):
    """The counterfactual: the same loop with plain localCheckpoint grows
    the stat superlinearly within a few rounds (this is WHY ckpt.py exists;
    if Spark ever stops propagating originStats this test flags that the
    helper can be retired)."""
    a = spark.range(50).select(
        F.col("id").alias("k"), F.lit(1.0).alias("x")
    ).localCheckpoint(eager=True)
    b = spark.range(50).select(
        F.col("id").alias("k"), F.lit(2.0).alias("y")
    ).localCheckpoint(eager=True)
    for _ in range(4):
        a2 = a.join(b, "k").select(
            "k", (F.col("x") + F.col("y")).alias("x")
        ).localCheckpoint(eager=True)
        b2 = b.join(a, "k").select(
            "k", (F.col("y") + F.col("x")).alias("y")
        ).localCheckpoint(eager=True)
        a, b = a2, b2
    assert _size_bits(a) > 64


def test_superstep_manifest_partition_lineage_and_verify(spark, tmp_path):
    """SuperstepDriver manifests carry per-partition (rows, sum_hash)
    lineage; try_resume re-derives the partitioning-independent totals from
    the reloaded parquet and refuses a tampered checkpoint."""
    import json
    import os

    from networkit_spark.plans.iterate import SuperstepDriver

    ckpt = str(tmp_path / "ck")
    init = spark.range(200).select("id", (F.col("id") * 1.0).alias("x"))

    def step(df, i):
        return df.select("id", (F.col("x") + 1.0).alias("x")), None

    driver = SuperstepDriver(max_iter=3, checkpoint_dir=ckpt, checkpoint_every=2)
    driver.run(init, step)

    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    stats = manifest["partition_stats"]
    assert sum(s["rows"] for s in stats) == 200
    assert all(s["sum_hash"] >= 0 for s in stats)

    resumed = driver.try_resume(spark)
    assert resumed.iteration == 3
    assert sorted(r["x"] for r in resumed.df.collect())[0] == 3.0

    # tamper: drop one parquet part file -> totals no longer match
    data_dir = manifest["data_path"]
    parts = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    if len(parts) > 1:
        os.remove(os.path.join(data_dir, parts[0]))
        try:
            driver.try_resume(spark)
            raise AssertionError("tampered checkpoint accepted")
        except RuntimeError as e:
            assert "checkpoint verification failed" in str(e)
