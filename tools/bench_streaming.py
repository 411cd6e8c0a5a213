"""Streaming-pipeline benchmark (round-4 verdict item #9): run
IncrementalPageRankPipeline over an sf0.1-equivalent event volume and record
per-batch fold throughput plus warm-start supersteps vs a cold recompute.

Event stream: the sf0.1 lineitem edge set (~600k canonical edges) replayed
as EDGE_ADDITION events in BATCHES sequential micro-batch files —
deterministic, no external data. After the drain, a cold
``pagerank(tol)`` on the fully-folded edge table gives the supersteps a
from-scratch recompute would pay per batch; the warm pipeline pays the
recorded (smaller, shrinking) counts because each batch starts from the
previous stationary vector.

Usage: python tools/bench_streaming.py  → one JSON line +
BENCH/streaming.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "8"))
TOL = 1e-6


def main():
    from pyspark.sql import functions as F

    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.session import get_spark
    from networkit_spark.streaming.pipeline import IncrementalPageRankPipeline
    from networkit_spark.testgraph import lineitem_edges

    spark = get_spark("bench-streaming", cpus=CPUS, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    edges = lineitem_edges(spark, SF_DIR, n_nodes=20_000).persist()
    m = edges.count()
    work = tempfile.mkdtemp(prefix="nk_stream_bench_")
    in_dir = os.path.join(work, "events")
    os.makedirs(in_dir)
    # BATCHES event files, hash-sliced so each batch touches the whole
    # id space (the realistic shape: arriving links are not id-clustered)
    ev = edges.select(
        F.row_number()
        .over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("src", "dst"))
        .cast("long")
        .alias("seq"),
        F.lit("EDGE_ADDITION").alias("type"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("weight").alias("w"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    for b in range(BATCHES):
        batch = ev.filter(F.pmod(F.xxhash64("u", "v"), F.lit(BATCHES)) == b)
        tmp = os.path.join(work, f"j{b}")
        batch.coalesce(1).write.mode("overwrite").json(tmp)
        import glob

        src = glob.glob(os.path.join(tmp, "part-*.json"))[0]
        # batch files are dropped one at a time; availableNow drains each
        shutil.copy(src, os.path.join(in_dir, f"batch_{b:03d}.json"))

    ckpt = os.path.join(work, "ckpt")
    state = os.path.join(work, "state")
    pipe = IncrementalPageRankPipeline(
        spark, in_dir, ckpt, state, tol=TOL, collect_stats=True
    )
    t0 = time.time()
    pipe.run_available(timeout_sec=3600, max_files_per_batch=1)
    wall = time.time() - t0

    folded = pipe.edges.count()
    cold_t0 = time.time()
    cold = pagerank(Graph(pipe.edges, weighted=True), tol=TOL)
    cold.count()
    cold_sec = time.time() - cold_t0

    out = {
        "metric": "streaming_pipeline_sf01",
        "value": round(wall, 2),
        "unit": "sec",
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "events_total": m,
        "events_per_sec": round(m / wall, 1),
        "batches": pipe.batch_stats,
        "folded_edges": folded,
        "warm_supersteps": [b["warm_supersteps"] for b in pipe.batch_stats],
        "cold_supersteps": cold._iterations,
        "cold_pagerank_sec": round(cold_sec, 2),
        "tol": TOL,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "BENCH", "streaming.json"), "w") as f:
        f.write(line + "\n")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
