"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Since round 5 the artifact is host-noise-proofed and tracks the engine's
real cost centers: the six-query headline runs $SPARK_GRAFT_BENCH_ROUNDS
(default 3) alternating passes and reports each query's MINIMUM (raws in
extra.rounds_raw), and the heavyweight kernels scc/hits/ktruss are timed
once and included in ``queries``. ``value`` = sum over ALL listed queries;
``extra.headline6_total`` is the six-query min-of-rounds total directly
comparable to BENCH_r01-r04.

Extra keys (informational, driver ignores them): edges/sec-per-superstep for
PageRank (the BASELINE.md primary target) and graph size.

``run_headline`` is the shared core so the sf1-scale run
(tools/bench_sf1.py, synthetic RMAT + replicated corpus) times the IDENTICAL
query set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# graph size scales with SF: sf0.1 → ~20k nodes / ~590k edges
N_NODES = int(os.environ.get("SPARK_GRAFT_BENCH_NODES", "20000"))
PR_ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_PR_ITERS", "10"))


def run_headline(spark, edges, docs, emb, shuffle: int, pr_iters: int = PR_ITERS):
    """Time the six headline queries over the given inputs.

    ``edges``: (src, dst, weight) undirected edge DataFrame; ``docs``:
    documents(doc_id, text, ...); ``emb``: embeddings(vec_id, embedding, ...).
    Returns ``(timings, extra)`` dicts — same keys the driver's
    BENCH_r{N}.json records.
    """
    from pyspark.sql import functions as F

    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank, _transition
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.community import plp
    from networkit_spark.operators.triangles import triangles
    from networkit_spark.functions.dedup import minhash_lsh_pairs
    from networkit_spark.functions.similarity import cosine_topk_bruteforce

    edges = edges.persist()
    m = edges.count()
    g = Graph(edges, directed=False, weighted=True)
    n = g.num_nodes()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {"nodes": n, "edges": m}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # q1: PageRank, fixed supersteps — the primary target metric
    timed("pagerank", lambda: pagerank(g, fixed_iters=pr_iters, num_partitions=shuffle).agg(F.sum("score")).collect())
    # edges processed per superstep = 2m (sym gather); per-superstep rate
    extra["pagerank_eps_per_superstep"] = round(2 * m / (timings["pagerank"] / pr_iters), 1)
    extra["pagerank_iters"] = pr_iters

    # steady-state superstep rate (BASELINE.md primary metric): cached
    # pre-partitioned transition, warm-up excluded, median of 6 supersteps
    trans = _transition(g, num_partitions=shuffle).persist()
    m_sym = trans.count()
    nodes = g.nodes().persist()
    n_nodes = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("score")).localCheckpoint(True)
    steps = []
    prev = None
    for i in range(8):
        t0 = time.time()
        sums = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy("dst").agg(F.sum(F.col("p") * F.col("score")).alias("mass"))
        )
        new = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            (F.lit(0.85) * F.coalesce("mass", F.lit(0.0)) + F.lit(0.15 / n_nodes)).alias("score"),
        ).localCheckpoint(True)
        if prev is not None:
            prev.unpersist(True)
        prev = ranks
        ranks = new
        steps.append(time.time() - t0)
    trans.unpersist()
    nodes.unpersist()
    steady = sorted(steps[2:])
    med = steady[len(steady) // 2]
    extra["pagerank_sec_per_superstep_steady"] = round(med, 4)
    extra["pagerank_eps_per_superstep_steady"] = round(m_sym / med, 1)

    # q2: connected components to fixpoint
    timed("connected_components", lambda: connected_components(g).select(F.countDistinct("component")).collect())
    extra["cc_eps"] = round(2 * m / timings["connected_components"], 1)

    # q3: PLP, 4 synchronous sweeps
    timed("plp", lambda: plp(g, fixed_iters=4).select(F.countDistinct("label")).collect())

    # q4: triangle count (degree-ordered wedge join)
    timed("triangle_count", lambda: triangles(g).count())
    extra["tri_eps"] = round(2 * m / timings["triangle_count"], 1)

    # q5: MinHash-LSH near-dup pairs over documents
    timed("minhash_dedup", lambda: minhash_lsh_pairs(docs, threshold=0.5).count())

    # q6: ANN cosine top-10, 8 query vectors, brute force
    qv = emb.filter("vec_id < 8").withColumnRenamed("vec_id", "query_id")
    timed("ann_topk", lambda: cosine_topk_bruteforce(emb, qv, k=10).count())

    edges.unpersist()
    return timings, extra


def run_heavy(spark, edges, shuffle: int):
    """The engine's cost-center kernels (round-4 verdict item #8): the
    six-query headline hasn't tracked where wall-time actually goes since
    scc/hits/ktruss landed, so the driver artifact now times them too.
    Directed graph for scc/hits: canonical edge low→high plus the reverse
    arc for every 3rd edge (hash-picked) — deterministic, reciprocity ~1/3,
    web-like (same construction as tools/bench_sf1.run_extended)."""
    from pyspark.sql import functions as F

    from networkit_spark.graph import Graph
    from networkit_spark.operators.components import strongly_connected_components
    from networkit_spark.operators.triangles import k_truss
    from networkit_spark.operators.webstructure import hits

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    und = Graph(edges, directed=False, weighted=True)
    arcs = edges.select("src", "dst", "weight").unionByName(
        edges.filter(F.pmod(F.xxhash64("src", "dst"), F.lit(3)) == 0).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    dg = Graph(arcs, directed=True, weighted=True)
    timed("scc", lambda: strongly_connected_components(dg).count())
    timed("hits", lambda: hits(dg, fixed_iters=8).count())
    timed("ktruss", lambda: k_truss(und, 5).count())
    return timings


def main():
    from networkit_spark.session import get_spark
    from networkit_spark.testgraph import lineitem_edges

    # Size shuffle partitions to the DATA, not the core count (session.py:
    # "the right knob to raise at 100 TB" — and to LOWER at bench scale).
    # Target >= ~75k edge rows per partition: at sf0.1 (~600k rows) that is 8
    # partitions — per-superstep task-scheduling overhead dominates wall time
    # when 64 near-empty tasks chase 600k rows; the identical rule sized
    # upward yields tens of thousands of partitions on a 100 TB input (then
    # capped by cluster width). Measured on this host: 0.34 s/superstep at 8
    # partitions vs 1.00 s at 64 for the same sf0.1 PageRank.
    import pyarrow.parquet as pq

    li_rows = pq.ParquetFile(
        os.path.join(SF_DIR, "lineitem.parquet")
    ).metadata.num_rows
    shuffle = max(8, min(2 * CPUS, li_rows // 75_000))
    spark = get_spark(
        "networkit-spark-bench", cpus=CPUS, shuffle_partitions=shuffle
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = lineitem_edges(spark, SF_DIR, n_nodes=N_NODES)
    # The sf tables are single parquet files → ONE scan split; shingling /
    # dot products are CPU-bound vectorized work, so spread them across the
    # cores (a 100 TB table arrives in thousands of scan splits by itself —
    # this repartition is the small-file analog).
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(CPUS)

    # Warm-up (untimed): spawn the Python/Arrow UDF workers and trigger
    # whole-stage codegen + JIT once before the timed section. A long-lived
    # cluster pays these once per executor, not once per query; charging
    # worker spawn to the first timed query would measure process startup,
    # not the engine. Touches each input once (scan + tiny shuffle + one
    # vectorized UDF batch).
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    _warm = pandas_udf(
        lambda s: s.str.len(), "long", PandasUDFType.SCALAR
    )

    # full light pass (length only, no shingling) so every partition spawns
    # its worker; limit() would collapse to one partition / one worker
    docs.select(_warm("text").alias("tl")).agg(F.sum("tl")).collect()
    emb.select(F.size("embedding").alias("d")).agg(F.max("d")).collect()
    edges.groupBy("src").count().count()

    # The sandbox host's deliverable compute swings >2x over minutes
    # (external contention, BENCH/cpu_calibration.json), so a single pass
    # conflates host drift with engine cost. Run ROUNDS alternating passes
    # and keep each query's MINIMUM (noise is additive — round-4 verdict
    # item #10); the per-round raws stay in extra so drift is auditable.
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    timings, extra = run_headline(spark, edges, docs, emb, shuffle)
    all_rounds = [dict(timings)]
    for _ in range(rounds - 1):
        t, e = run_headline(spark, edges, docs, emb, shuffle)
        all_rounds.append(dict(t))
        if t["pagerank"] < timings["pagerank"]:
            extra = e
        timings = {k: min(timings[k], t[k]) for k in timings}
    headline6_total = round(sum(timings.values()), 3)
    extra["rounds"] = rounds
    extra["rounds_raw"] = all_rounds
    extra["headline6_total"] = headline6_total  # comparable to BENCH_r01-r04

    # Heavyweights (single pass — they dominate wall-clock; their raws are
    # the timings themselves).
    if os.environ.get("SPARK_GRAFT_BENCH_HEAVY", "1") != "0":
        edges.persist()
        heavy = run_heavy(spark, edges, shuffle)
        edges.unpersist()
        timings.update(heavy)
        extra["heavy_total"] = round(sum(heavy.values()), 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
