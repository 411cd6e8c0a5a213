"""SparkSession factory tuned for iterative link-graph analytics.

Defaults chosen for the sandbox (single JVM, ``local[N]``) but expressed so the
same code scales to a multi-executor cluster: AQE on (skew-join splitting,
partition coalescing), Arrow exchange for the few pandas-UDF paths, shuffle
partitions sized to the core count (override per-job for 100 TB inputs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "networkit-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    On a real cluster the ``master`` would come from spark-submit; here we pin
    ``local[cpus]``. Shuffle partitions default to ``2*cpus`` — small enough to
    keep per-superstep scheduling overhead low in the sandbox, and the right
    knob to raise (to e.g. #cores*3 cluster-wide) at 100 TB.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(2 * cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # bucketed tables (plans/warehouse.py) need a writable catalog dir;
        # keep it out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/networkit_spark-warehouse"),
        )
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # iterative jobs: keep the RPC chatter + broadcast timeouts generous
        .config("spark.network.timeout", "600s")
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # iterative supersteps drop a shuffle per iteration; GC the driver
        # periodically so dropped shuffle files are actually deleted (without
        # this, superstep time creeps upward — measured in BENCH/BASELINE.md)
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
