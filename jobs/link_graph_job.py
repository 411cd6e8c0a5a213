"""spark-submit entrypoint for the link-graph analytics pipeline.

north_rule: "the full pipeline ships as spark-submit --py-files jobs on a
multi-executor cluster ... resumable from checkpoint with per-partition
lineage + metrics".  This is that job.  Package + submit with::

    jobs/submit.sh --master <cluster-master> \\
        jobs/link_graph_job.py \\
        --input /data/pages --input-kind pages \\
        --algorithm pagerank --output /data/out/pr \\
        --checkpoint-dir /data/ckpt/pr --resume

The session master comes from spark-submit (``--master``), NOT from the
library's local[N] test factory; every knob a cluster operator needs
(shuffle partitions, transition partitions, tolerance) is an argument.

Input kinds
-----------
``edges``  parquet of (src:long, dst:long[, weight:double])
``pages``  parquet of Common-Crawl-style pages (url, warc_ts, html, text,
           lang) per BASELINE.json input_hint; edges are extracted with the
           vectorized Arrow href extractor (sources/pages.py) and node ids
           assigned with the distributed range-partitioned id assigner.

Resumability: with ``--checkpoint-dir`` the superstep driver
(plans/iterate.py) writes a durable parquet snapshot + JSON manifest (per-
iteration residual/seconds metrics, partition count) every
``--checkpoint-every`` iterations; ``--resume`` restarts from the latest
manifest instead of iteration 0.

Reference semantics: PageRank damping/convergence matches
cpp/centrality/PageRank.cpp:35-68; components cpp/components/
ParallelConnectedComponents.cpp; PLP cpp/community/PLP.cpp:43-105;
triangles cpp/centrality/LocalClusteringCoefficient via node-iterator.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def build_session(args) -> SparkSession:
    """Session for spark-submit: master/deploy-mode come from the submit
    command line; we only set job-level SQL knobs."""
    builder = SparkSession.builder.appName(f"networkit-spark:{args.algorithm}")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    return builder.getOrCreate()


def load_edges(spark: SparkSession, args):
    from networkit_spark.graph import Graph

    if args.input_kind == "edges":
        edges = spark.read.parquet(args.input)
        if "weight" not in edges.columns:
            edges = edges.withColumn("weight", F.lit(1.0))
    else:  # pages
        from networkit_spark.sources.pages import assign_node_ids, pages_to_edges

        pages = spark.read.parquet(args.input)
        id_map = assign_node_ids(pages)
        edges = pages_to_edges(pages, id_map=id_map)
        if "weight" not in edges.columns:
            edges = edges.withColumn("weight", F.lit(1.0))
    return Graph(
        edges.select("src", "dst", "weight"),
        directed=args.directed,
        weighted=True,
    )


def run_algorithm(spark: SparkSession, graph, args):
    """Dispatch; returns (result_df, extra_metrics dict)."""
    if args.algorithm == "pagerank":
        from networkit_spark.operators.pagerank import pagerank

        result = pagerank(
            graph,
            damp=args.damping,
            tol=args.tol,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            resume=args.resume,
        )
        return result, {"iterations": result._iterations}
    if args.algorithm == "components":
        from networkit_spark.operators.components import connected_components

        result = connected_components(
            graph,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir,
        )
        return result, {}
    if args.algorithm == "plp":
        from networkit_spark.operators.community import plp

        result = plp(
            graph,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir,
        )
        return result, {}
    if args.algorithm == "triangles":
        from networkit_spark.operators.triangles import node_triangle_counts

        return node_triangle_counts(graph), {}
    if args.algorithm == "hits":
        from networkit_spark.operators.webstructure import hits

        return hits(graph, tol=args.tol, max_iter=args.max_iter), {}
    if args.algorithm == "bowtie":
        from networkit_spark.operators.webstructure import bowtie_decomposition

        if not graph.directed:
            raise SystemExit("--algorithm bowtie needs --directed input")
        return bowtie_decomposition(graph), {}
    if args.algorithm == "scc":
        from networkit_spark.operators.components import (
            strongly_connected_components,
        )

        if not graph.directed:
            raise SystemExit("--algorithm scc needs --directed input")
        stats: dict = {}
        result = strongly_connected_components(graph, stats=stats)
        return result, stats
    if args.algorithm == "ktruss":
        from networkit_spark.operators.triangles import k_truss

        stats = {}
        result = k_truss(graph, args.truss_k, stats=stats)
        return result, {"rounds": stats.get("rounds")}
    if args.algorithm == "maxent":
        from networkit_spark.operators.graphlayout import maxent_stress

        return maxent_stress(graph, rounds=args.max_iter), {}
    raise SystemExit(f"unknown algorithm {args.algorithm!r}")


def _write_manifest(spark: SparkSession, output: str, metrics: dict) -> None:
    """Write ``_JOB_METRICS.json`` next to the output THROUGH the Hadoop
    filesystem of the output URI, so cluster URIs (hdfs://, s3a://) land the
    manifest beside the parquet instead of a literal local 'hdfs:/...'
    directory on the driver node. Local paths resolve to file:// and behave
    as before."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(output, "_JOB_METRICS.json")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(path, True)
    try:
        stream.write(bytearray(json.dumps(metrics, indent=2).encode("utf-8")))
    finally:
        stream.close()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--input-kind", choices=["edges", "pages"], default="edges")
    p.add_argument(
        "--algorithm",
        choices=[
            "pagerank", "components", "plp", "triangles", "hits", "bowtie",
            "scc", "ktruss", "maxent",
        ],
        default="pagerank",
    )
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--directed", action="store_true")
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--truss-k", type=int, default=4)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args(argv)

    t0 = time.time()
    spark = build_session(args)
    graph = load_edges(spark, args)
    result, extra = run_algorithm(spark, graph, args)
    result.write.mode("overwrite").parquet(args.output)

    # job-level metrics manifest next to the output (cluster operators read
    # this; the per-iteration metrics live in the checkpoint manifest)
    metrics = {
        "algorithm": args.algorithm,
        "input": args.input,
        "input_kind": args.input_kind,
        "seconds": round(time.time() - t0, 3),
        "output_rows": spark.read.parquet(args.output).count(),
        **extra,
    }
    _write_manifest(spark, args.output, metrics)
    print(json.dumps(metrics), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
