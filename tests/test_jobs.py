"""End-to-end spark-submit --py-files job tests (north_rule packaging +
resumability). Runs the REAL submit path via subprocess: jobs/submit.sh zips
the library, spark-submit runs jobs/link_graph_job.py in a fresh JVM whose
only access to networkit_spark is the --py-files zip."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = os.path.join(REPO, "jobs", "submit.sh")
JOB = os.path.join(REPO, "jobs", "link_graph_job.py")


def _run_job(args, cwd):
    env = dict(os.environ)
    # keep the worker python consistent with the driver
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    # the submitted JVM must find networkit_spark ONLY via --py-files
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        ["bash", SUBMIT, "--master", "local[4]", JOB, *args],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=cwd,
        env=env,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout[-3000:]}\nstderr:\n{res.stderr[-3000:]}"
    return res


@pytest.fixture(scope="module")
def edges_parquet(spark, tmp_path_factory):
    from networkit_spark.generators import rmat

    path = str(tmp_path_factory.mktemp("job") / "edges.parquet")
    g = rmat(spark, scale=9, edge_factor=6, seed=7)
    g.edges.write.mode("overwrite").parquet(path)
    return path


def test_submit_pagerank_with_resume(edges_parquet, spark, tmp_path):
    out1 = str(tmp_path / "pr_full")
    ckpt = str(tmp_path / "ckpt")

    # Phase 1: run 4 fixed-ish iterations (max_iter cap), checkpoint every 2.
    _run_job(
        [
            "--input", edges_parquet,
            "--algorithm", "pagerank",
            "--output", out1,
            "--checkpoint-dir", ckpt,
            "--checkpoint-every", "2",
            "--tol", "0",
            "--max-iter", "4",
        ],
        cwd=str(tmp_path),
    )
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert manifest["iteration"] == 4
    assert len(manifest["metrics"]) == 4
    assert manifest["partitions"] >= 1
    # per-partition lineage: one (rows, sum_hash) record per partition, and
    # the totals must match the written data exactly (re-verified on resume)
    stats = manifest["partition_stats"]
    # one record per NON-EMPTY partition (groupBy partition id)
    assert 1 <= len(stats) <= manifest["partitions"]
    # lineage totals cover the full rank vector: one row per graph node
    n_rows = spark.read.parquet(os.path.join(ckpt, "iter_00004")).count()
    assert sum(s["rows"] for s in stats) == n_rows > 0

    # Phase 2: resume from the durable checkpoint, run to 8 total.
    out2 = str(tmp_path / "pr_resumed")
    _run_job(
        [
            "--input", edges_parquet,
            "--algorithm", "pagerank",
            "--output", out2,
            "--checkpoint-dir", ckpt,
            "--checkpoint-every", "2",
            "--tol", "0",
            "--max-iter", "8",
            "--resume",
        ],
        cwd=str(tmp_path),
    )
    manifest2 = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert manifest2["iteration"] == 8
    # resumed run appended 4 more per-iteration metric records
    assert len(manifest2["metrics"]) == 8

    # Resumed result equals an uninterrupted 8-iteration run (same library,
    # in-process) to float tolerance.
    from pyspark.sql import functions as F
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank

    edges = spark.read.parquet(edges_parquet)
    ref = pagerank(Graph(edges, weighted=True), tol=0.0, fixed_iters=8)
    got = spark.read.parquet(out2)
    diff = (
        ref.join(got.withColumnRenamed("score", "score2"), "node")
        .agg(F.max(F.abs(F.col("score") - F.col("score2"))).alias("d"))
        .collect()[0]["d"]
    )
    assert diff < 1e-9

    metrics = json.load(open(os.path.join(out2, "_JOB_METRICS.json")))
    assert metrics["algorithm"] == "pagerank"
    assert metrics["output_rows"] == ref.count()


def test_submit_components_from_pages(spark, tmp_path):
    """pages input kind: href-extraction pipeline inside the submitted job."""
    from networkit_spark.generators import rmat
    from networkit_spark.sources.pages import synthesize_pages

    g = rmat(spark, scale=8, edge_factor=4, seed=11)
    pages_path = str(tmp_path / "pages.parquet")
    synthesize_pages(g).write.mode("overwrite").parquet(pages_path)

    out = str(tmp_path / "cc")
    _run_job(
        [
            "--input", pages_path,
            "--input-kind", "pages",
            "--algorithm", "components",
            "--output", out,
        ],
        cwd=str(tmp_path),
    )
    df = spark.read.parquet(out)
    assert df.columns == ["node", "component"]
    assert df.count() > 0


def test_submit_hits(edges_parquet, spark, tmp_path):
    """The web-analytics additions ride the same spark-submit surface."""
    out = str(tmp_path / "hits_out")
    _run_job(
        [
            "--input", edges_parquet,
            "--algorithm", "hits",
            "--directed",
            "--max-iter", "8",
            "--output", out,
        ],
        cwd=REPO,
    )
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) == {"node", "hub", "auth"}


def test_submit_scc_and_ktruss(edges_parquet, spark, tmp_path):
    out = str(tmp_path / "scc_out")
    _run_job(
        [
            "--input", edges_parquet,
            "--algorithm", "scc",
            "--directed",
            "--output", out,
        ],
        cwd=REPO,
    )
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) == {"node", "component"}
    out2 = str(tmp_path / "truss_out")
    _run_job(
        [
            "--input", edges_parquet,
            "--algorithm", "ktruss",
            "--truss-k", "3",
            "--output", out2,
        ],
        cwd=REPO,
    )
    got2 = spark.read.parquet(out2)
    assert set(got2.columns) == {"src", "dst"}
