"""Skew evidence (BASELINE.md deliverable #3, round-2 verdict item #5).

Runs the CSR-block PageRank (plans/layout.py) on the hub-skew generator
(generators.hub_skew_graph — one node receives ``hub_fraction`` of all
edges) twice: with high-degree vertex SPLITTING enabled (salt_threshold
below the hub degree) and disabled (threshold above it).  Records, per
config:

- per-bucket adjacency block sizes (max / median edge rows per bucket) —
  the deterministic skew measure: an unsalted hub's whole adjacency lands
  in ONE bucket, a salted hub spreads over ``salts`` buckets;
- per-task wall-time distribution of the straggler stage (max / median task
  duration, from the Spark UI REST API) — the runtime measure the verdict
  asked for;
- end-to-end wall time of the fixed-superstep PageRank.

Writes BENCH/skew.json; the summary table goes in BENCH/BASELINE.md.

Usage: python tools/skew_bench.py [n] [m] [hub_fraction] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
HUB_FRACTION = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 6
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BUCKETS = 32
SALTS = 16
UI = "http://localhost:4040"


def _get(path):
    with urllib.request.urlopen(f"{UI}{path}", timeout=10) as r:
        return json.loads(r.read())


def straggler_stage(app_id: str, since_ms: float) -> dict:
    """Max/median task duration of the worst (longest-max-task) stage
    submitted after ``since_ms``."""
    stages = _get(f"/api/v1/applications/{app_id}/stages?status=COMPLETE")
    worst = None
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        t = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S"))
        if t * 1000 < since_ms or s.get("numCompleteTasks", 0) < 2:
            continue
        try:
            q = _get(
                f"/api/v1/applications/{app_id}/stages/{s['stageId']}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        med, mx = q["duration"]
        if worst is None or mx > worst["max_task_ms"]:
            worst = {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "median_task_ms": med,
                "max_task_ms": mx,
                "ratio": round(mx / max(med, 1.0), 2),
            }
    return worst or {}


def main():
    from pyspark.sql import functions as F

    from networkit_spark.session import get_spark
    from networkit_spark.generators import hub_skew_graph
    from networkit_spark.plans.layout import build_csr_blocks, pagerank_csr

    spark = get_spark(
        "networkit-spark-skew",
        cpus=CPUS,
        shuffle_partitions=BUCKETS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    g = hub_skew_graph(spark, n=N, m=M, hub_fraction=HUB_FRACTION)
    g.edges.persist().count()
    hub_deg = (
        g.sym().groupBy("src").count().agg(F.max("count")).collect()[0][0]
    )

    out = {
        "n": N, "m_generated": M, "hub_fraction": HUB_FRACTION,
        "hub_degree": int(hub_deg), "buckets": BUCKETS, "salts": SALTS,
        "iters": ITERS, "cpus": CPUS, "configs": {},
    }
    for label, threshold in (
        ("unsalted", 2**62),
        ("salted", max(1000, int(hub_deg // (2 * SALTS)))),
    ):
        blocks, _ = build_csr_blocks(
            g, num_buckets=BUCKETS, salt_threshold=threshold, salts=SALTS
        )
        sizes = sorted(
            r[0]
            for r in blocks.select(F.size("dsts")).collect()
        )
        med_block = sizes[len(sizes) // 2]
        t0 = time.time()
        pagerank_csr(
            g, fixed_iters=ITERS, num_buckets=BUCKETS, salt_threshold=threshold
        ).agg(F.sum("score")).collect()
        wall = round(time.time() - t0, 2)
        out["configs"][label] = {
            "salt_threshold": threshold,
            "block_rows_max": sizes[-1],
            "block_rows_median": med_block,
            "block_skew_ratio": round(sizes[-1] / max(med_block, 1), 2),
            "wall_sec": wall,
            "straggler": straggler_stage(app_id, t0 * 1000),
        }
        print(label, json.dumps(out["configs"][label]), flush=True)

    with open(os.path.join(REPO, "BENCH", "skew.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
