"""Per-query superstep/round counts at the gate SF (round-3 verdict item #1
"a BENCH entry recording per-query superstep counts"): makes the
round-count × scheduling-latency cost model inspectable and lets the next
round attribute wall-time deltas to round counts vs per-round cost.

Usage: python tools/superstep_report.py [sf_dir]  → BENCH/supersteps.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from networkit_spark.session import get_spark
    from networkit_spark.testgraph import lineitem_graph

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("superstep-report")
    spark.sparkContext.setLogLevel("ERROR")
    g = lineitem_graph(spark, sf_dir)
    gd = lineitem_graph(spark, sf_dir, directed=True)
    out: dict = {"sf_dir": sf_dir}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[name]["sec"] = round(time.time() - t0, 2)
        return r

    from networkit_spark.operators.pagerank import pagerank

    out["pagerank"] = {}
    pr = timed("pagerank", lambda: pagerank(g, tol=1e-9))
    out["pagerank"]["supersteps"] = pr._iterations

    from networkit_spark.operators.components import (
        connected_components,
        strongly_connected_components,
    )

    out["connected_components"] = {}
    cc = timed("connected_components", lambda: connected_components(g))
    out["connected_components"]["supersteps"] = cc._iterations

    st: dict = {}
    out["scc"] = {}
    timed("scc", lambda: strongly_connected_components(gd, stats=st).count())
    out["scc"].update(st)

    from networkit_spark.operators.community import plp

    out["plp"] = {}
    labels = timed("plp", lambda: plp(g))
    out["plp"]["supersteps"] = labels._iterations

    from networkit_spark.operators.triangles import k_truss

    st = {}
    out["ktruss"] = {}
    timed("ktruss", lambda: k_truss(g, 4, stats=st).count())
    out["ktruss"].update(
        {"rounds": st.get("rounds"), "frontiers": st.get("frontiers")}
    )

    from networkit_spark.operators.matching import path_growing_matching

    st = {}
    out["path_growing"] = {}
    timed("path_growing", lambda: path_growing_matching(g, stats=st).count())
    out["path_growing"].update(st)

    from networkit_spark.operators.misc import random_spanning_forest

    st = {}
    out["rsf"] = {}
    timed("rsf", lambda: random_spanning_forest(g, stats=st).count())
    out["rsf"].update(st)

    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "BENCH", "supersteps.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
