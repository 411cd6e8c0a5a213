"""PageRank kernel head-to-head: logical SQL superstep vs the CSR/Arrow
applyInPandas SpMV (plans/layout.py), same graph, same layout, same cadence.

Why this tool exists: both kernels are oracle-equal (gate queries `pagerank`
and `pagerank_csr`), so the DEFAULT should be whichever is faster at scale.
The structural difference: the SQL kernel keeps the cached transition edges
JVM-side across supersteps (only the O(n) rank vector moves), while the
applyInPandas kernel re-ships the static adjacency blocks through Arrow to
Python workers EVERY superstep — a per-superstep serialization cost
proportional to m, not n. This measures that difference.

Usage: python tools/kernel_compare.py [scale] [cpus] [iters]
Writes BENCH/kernel_compare.json and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from networkit_spark.generators import rmat  # noqa: E402
from networkit_spark.operators.pagerank import _transition  # noqa: E402
from networkit_spark.plans.layout import build_csr_blocks, spmv_superstep  # noqa: E402
from networkit_spark.session import get_spark  # noqa: E402

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 19
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 6

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
spark = get_spark(
    f"kernel-compare-{cpus}",
    cpus=cpus,
    shuffle_partitions=32,
    extra_conf={
        # same pinned-layout config as tools/scaling_bench.py: fixed
        # 32-partition data layout, no AQE coalescing, no per-step broadcast
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.cleaner.periodicGC.interval": "30s",
    },
)
spark.sparkContext.setLogLevel("ERROR")

g = rmat(spark, scale=scale, edge_factor=16, seed=42, num_partitions=32)
trans = _transition(g, num_partitions=32).persist()
m = trans.count()
n = g.num_nodes()
print(f"graph ready n={n} m={m}", flush=True)
nodes = g.nodes().repartition(32, "node").persist()
nodes.count()
teleport = 0.15 / n


def loop(make_sums, tag):
    ranks = nodes.select("node", F.lit(1.0 / n).alias("score")).localCheckpoint(True)
    ts = []
    for i in range(iters):
        t0 = time.time()
        sums = make_sums(ranks)
        new = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            (F.lit(0.85) * F.coalesce("mass", F.lit(0.0)) + F.lit(teleport)).alias(
                "score"
            ),
        )
        ranks = new.localCheckpoint(True)
        ts.append(time.time() - t0)
        print(tag, i, round(ts[-1], 2), flush=True)
    return ts


t_sql = loop(
    lambda r: (
        trans.join(r, trans.src == r.node)
        .groupBy("dst")
        .agg(F.sum(F.col("p") * F.col("score")).alias("mass"))
    ),
    "sql",
)

t0 = time.time()
blocks, need = build_csr_blocks(g, num_buckets=32, salt_threshold=100000)
blocks = blocks.persist()
need = need.persist()
blocks.count()
need.count()
csr_build = round(time.time() - t0, 2)
print("csr build", csr_build, flush=True)
t_csr = loop(lambda r: spmv_superstep(blocks, need, r), "csr")


def med(ts):
    s = sorted(ts[2:])  # drop 2 warm-up supersteps
    return s[len(s) // 2]


result = {
    "scale": scale,
    "cpus": cpus,
    "iters": iters,
    "n": n,
    "m": m,
    "sql_sec_per_superstep_med": round(med(t_sql), 3),
    "sql_eps_per_superstep": round(m / med(t_sql), 0),
    "csr_build_sec": csr_build,
    "csr_sec_per_superstep_med": round(med(t_csr), 3),
    "csr_eps_per_superstep": round(m / med(t_csr), 0),
    "sql_steps": [round(t, 3) for t in t_sql],
    "csr_steps": [round(t, 3) for t in t_csr],
}
os.makedirs("BENCH", exist_ok=True)
with open("BENCH/kernel_compare.json", "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result))
spark.stop()
