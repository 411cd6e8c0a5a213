"""Profile-suite BENCH entry (round-2 verdict item #10).

Runs :func:`networkit_spark.profiling.profile` — the reference's default
measure set (networkit/profiling/profiling.py:230-301) over one shared
cached graph — on the sf0.1 lineitem graph and records per-measure seconds
plus the suite-level aggregate edges/s in BENCH/profile_sf0.1.json.

Usage: python tools/profile_bench.py [sf_dir] [n_nodes]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_NODES = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from networkit_spark.session import get_spark
    from networkit_spark.testgraph import lineitem_graph
    from networkit_spark.profiling import profile, profile_report

    spark = get_spark("networkit-spark-profile", cpus=CPUS, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    g = lineitem_graph(spark, SF_DIR, n_nodes=N_NODES)
    res = profile(g)
    res["sf_dir"] = SF_DIR
    res["n_nodes_mod"] = N_NODES
    res["cpus"] = CPUS
    print(profile_report(res))
    with open(os.path.join(REPO, "BENCH", "profile_sf0.1.json"), "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
