"""Two-parallelism scaling evidence (BASELINE.md gate: efficiency >= 0.8
from N to 4N cores, sandboxed as local[8] vs local[32]).

Runs the identical PageRank job (fixed supersteps, RMAT web-like graph) in a
fresh JVM per parallelism level, measures steady-state per-superstep time
(excludes session + graph build + first warm-up superstep), and writes
BENCH/scaling.json + BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [scale] [edge_factor] [iters]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 18
EDGE_FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8

WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from networkit_spark.session import get_spark
from networkit_spark.generators import rmat
from networkit_spark.operators.pagerank import _transition

cpus, scale, ef, iters = (int(x) for x in sys.argv[1:5])
spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=2 * cpus)
spark.sparkContext.setLogLevel("ERROR")

g = rmat(spark, scale=scale, edge_factor=ef, seed=42, num_partitions=2 * cpus)
m_sym = g.sym().count()
n = g.num_nodes()
nodes = g.nodes().persist(); nodes.count()
trans = _transition(g, num_partitions=2 * cpus).persist(); trans.count()
teleport = 0.15 / n
ranks = nodes.select("node", F.lit(1.0 / n).alias("score")).localCheckpoint(True)

step_times = []
for i in range(iters):
    t0 = time.time()
    sums = (trans.join(F.broadcast(ranks), trans.src == ranks.node)
            .groupBy("dst").agg(F.sum(F.col("p") * F.col("score")).alias("mass")))
    new = nodes.join(F.broadcast(sums), nodes.node == sums.dst, "left").select(
        "node", (F.lit(0.85) * F.coalesce("mass", F.lit(0.0)) + F.lit(teleport)).alias("score"))
    ranks = new.localCheckpoint(True)
    step_times.append(time.time() - t0)

steady = step_times[1:]  # drop warm-up
per_step = sum(steady) / len(steady)
print(json.dumps({
    "cpus": cpus, "nodes": n, "edges_sym": m_sym, "iters": iters,
    "step_times": [round(t, 3) for t in step_times],
    "sec_per_superstep": round(per_step, 4),
    "eps_per_superstep": round(m_sym / per_step, 1),
}))
spark.stop()
"""


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(SCALE), str(EDGE_FACTOR), str(ITERS)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker cpus={cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    r8 = run(8)
    r32 = run(32)
    eff = (r32["eps_per_superstep"] / r8["eps_per_superstep"]) / 4.0
    result = {
        "graph": {"kind": "rmat", "scale": SCALE, "edge_factor": EDGE_FACTOR,
                  "nodes": r8["nodes"], "edges_sym": r8["edges_sym"]},
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "gate": ">= 0.8",
        "pass": eff >= 0.8,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(result, f, indent=2)
    md = f"""# BENCH/BASELINE.md — two-parallelism scaling evidence

Per the driver instruction, the north_rule's N→4N-executor scaling criterion is
evidenced by running the IDENTICAL PageRank job at two parallelism levels on
the same input and machine (single JVM, `local[8]` vs `local[32]`).

- Input: deterministic RMAT web-like graph, scale={SCALE} (n={r8['nodes']:,}),
  edge_factor={EDGE_FACTOR}, seed=42 — {r8['edges_sym']:,} directed (symmetrized) edges.
- Job: PageRank power iteration (damp 0.85), {ITERS} fixed supersteps;
  broadcast rank vector + cached pre-partitioned transition edges; steady-state
  per-superstep time excludes session startup, graph build, and the first
  warm-up superstep.

| parallelism | sec/superstep | edges/sec/superstep |
|---|---|---|
| local[8]  (N)  | {r8['sec_per_superstep']} | {r8['eps_per_superstep']:,.0f} |
| local[32] (4N) | {r32['sec_per_superstep']} | {r32['eps_per_superstep']:,.0f} |

**Scaling efficiency (eps_4N / eps_N) / 4 = {eff:.3f}** — gate >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}.

Caveat: both levels share one machine's memory bandwidth, so this measures
strong scaling inside one box, the sandbox stand-in for N vs 4N executors.
Raw per-superstep times: local[8]={r8['step_times']}, local[32]={r32['step_times']}.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
