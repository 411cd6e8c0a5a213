"""sf1-scale headline bench (round-2 verdict item #4).

The sf0.1 wall-times are scheduling-latency-dominated (a 600k-edge SpMV
superstep is ~0.67 s of task latency, not compute), so round-over-round
deltas at sf0.1 are noisy.  This runs the IDENTICAL six-query headline set
(bench.run_headline) at 10× that scale on deterministic synthetic inputs —
no external data, per the north rule:

- graph: R-MAT scale 19 / edge factor 12 (web-like quadrant skew, seed 42)
  → ~524k nodes, ~6M undirected weighted edges, the 10× analog of the sf0.1
  lineitem graph (20k / 599k);
- documents: the sf0.1 documents table replicated 10× with disjoint doc_id
  ranges (exact-duplicate replicas — the worst case for LSH bucket sizes);
- embeddings: the sf0.1 embeddings replicated 10× with disjoint vec_ids.

Inputs are materialized once to BENCH/sf1_data/*.parquet (gitignored) so the
timed queries read parquet exactly like bench.py does.

Usage: python tools/bench_sf1.py  → prints one JSON line and writes
BENCH/bench_sf1.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, "BENCH", "sf1_data")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = 19
EDGE_FACTOR = 12
REPLICAS = 10


def materialize(spark) -> None:
    from pyspark.sql import functions as F

    from networkit_spark.generators import rmat

    if os.path.exists(os.path.join(DATA_DIR, "_DONE")):
        return
    os.makedirs(DATA_DIR, exist_ok=True)
    g = rmat(spark, scale=SCALE, edge_factor=EDGE_FACTOR, seed=42)
    edges = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    edges.write.mode("overwrite").parquet(os.path.join(DATA_DIR, "edges.parquet"))

    rep = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(DATA_DIR, "documents.parquet"))
    )
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    (
        emb.crossJoin(rep)
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding", "label",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(DATA_DIR, "embeddings.parquet"))
    )
    open(os.path.join(DATA_DIR, "_DONE"), "w").write("ok\n")


def run_extended(spark, edges, docs, shuffle: int) -> dict:
    """Round-3/4 heavyweights at sf1 (verdict item #4): throughput records
    for scc / bowtie / ktruss / hits / salsa / commute_time_cg / line_dedup
    / path_growing so round-over-round deltas are attributable. The
    directed graph for scc/bowtie/hits/salsa orients each canonical edge
    low→high and adds the reverse arc for every 3rd edge (hash-picked) —
    deterministic, reciprocity ~1/3, web-like."""
    import time as _t

    from pyspark.sql import functions as F

    from networkit_spark.graph import Graph
    from networkit_spark.functions.dedup import line_dedup
    from networkit_spark.operators.algebraic import effective_resistance
    from networkit_spark.operators.components import strongly_connected_components
    from networkit_spark.operators.matching import path_growing_matching
    from networkit_spark.operators.triangles import k_truss
    from networkit_spark.operators.webstructure import bowtie_decomposition, hits, salsa

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = _t.time()
        out = fn()
        timings[name] = round(_t.time() - t0, 3)
        return out

    und = Graph(edges, directed=False, weighted=True)
    arcs = edges.select("src", "dst", "weight").unionByName(
        edges.filter(F.pmod(F.xxhash64("src", "dst"), F.lit(3)) == 0).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    dg = Graph(arcs, directed=True, weighted=True)
    timed("scc", lambda: strongly_connected_components(dg).count())
    timed("bowtie", lambda: bowtie_decomposition(dg).groupBy("region").count().collect())
    timed("hits", lambda: hits(dg, fixed_iters=8).count())
    timed("salsa", lambda: salsa(dg, fixed_iters=8).count())
    timed("ktruss", lambda: k_truss(und, 5).count())
    timed(
        "commute_time_cg",
        lambda: effective_resistance(
            und, [(0, 1), (2, 3), (4, 5), (6, 7)], iters=12, method="cg"
        ).count(),
    )
    timed("line_dedup", lambda: line_dedup(docs).agg(F.sum("n_removed")).collect())
    pg_sub = und.subgraph_from_nodes(
        und.nodes().filter(F.col("node") < 100_000).select("node")
    )
    timed("path_growing", lambda: path_growing_matching(pg_sub).count())
    # the tie-heavy-graph scale mode (round 5): hash order scatters tied
    # pointers so chains fire — 37 vs 25 rounds on this subgraph
    timed(
        "path_growing_hash",
        lambda: path_growing_matching(pg_sub, tie_break="hash").count(),
    )
    return timings


def main():
    from networkit_spark.session import get_spark
    from bench import run_headline

    # data-sized shuffle partitions (bench.py rule: >= ~75k edge rows per
    # partition, capped at 2*cores): ~6M edges → 64 partitions at 32 cores.
    m_approx = EDGE_FACTOR * (2 ** SCALE)
    shuffle = max(8, min(2 * CPUS, m_approx // 75_000))
    spark = get_spark("networkit-spark-bench-sf1", cpus=CPUS, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    materialize(spark)
    gen_sec = round(time.time() - t0, 1)

    edges = spark.read.parquet(os.path.join(DATA_DIR, "edges.parquet"))
    docs = spark.read.parquet(os.path.join(DATA_DIR, "documents.parquet")).repartition(CPUS)
    emb = spark.read.parquet(os.path.join(DATA_DIR, "embeddings.parquet")).repartition(CPUS)

    # The sandbox host's deliverable compute swings >2x over minutes
    # (external contention — identical triangle runs measured 34-104 s), so a
    # single pass conflates host drift with engine cost. Run ROUNDS passes
    # and keep each query's MINIMUM (noise is additive; same methodology as
    # tools/scaling_bench.py).
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "1"))
    timings, extra = run_headline(spark, edges, docs, emb, shuffle)
    all_rounds = [timings]
    for _ in range(rounds - 1):
        t, e = run_headline(spark, edges, docs, emb, shuffle)
        all_rounds.append(t)
        # keep the extra dict from the round with the fastest pagerank
        if t["pagerank"] < timings["pagerank"]:
            extra = e
        timings = {k: min(timings[k], t[k]) for k in timings}
    extra["materialize_sec"] = gen_sec
    extra["shuffle_partitions"] = shuffle
    extra["rounds"] = rounds
    if rounds > 1:
        extra["rounds_raw"] = all_rounds

    if os.environ.get("SPARK_GRAFT_BENCH_EXTENDED", "1") != "0":
        ext = run_extended(spark, edges, docs, shuffle)
        ext_rounds = [ext]
        for _ in range(rounds - 1):
            e2 = run_extended(spark, edges, docs, shuffle)
            ext_rounds.append(e2)
            ext = {k: min(ext[k], e2[k]) for k in ext}
        timings.update(ext)
        if rounds > 1:
            extra["extended_rounds_raw"] = ext_rounds

    out = {
        "metric": "headline_total_sf1",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "cpus": CPUS,
        "input": f"rmat(scale={SCALE}, ef={EDGE_FACTOR}) + sf0.1 corpus x{REPLICAS}",
        "extra": extra,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "BENCH", "bench_sf1.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
