"""workflows.batch + engineering scaling harnesses (reference
networkit/workflows.py:41-74, networkit/engineering.py:12-73)."""

from __future__ import annotations

import csv

from pyspark.sql import functions as F

from networkit_spark.engineering import strong_scaling, weak_scaling
from networkit_spark.graph import Graph
from networkit_spark.sources.edgelist import write_metis
from networkit_spark.workflows import batch, extract_largest_component


def test_batch_over_metis_directory(spark, tmp_path):
    gdir = tmp_path / "graphs"
    gdir.mkdir()
    for i, edges in enumerate([[(0, 1), (1, 2)], [(0, 1), (2, 3), (1, 2)]]):
        g = Graph.from_edge_list(spark, edges, num_nodes=4)
        write_metis(g, str(gdir / f"g{i}.graph"))
    (gdir / "ignore.txt").write_text("not a graph")

    out = str(tmp_path / "batch.tsv")
    rows = batch(
        spark,
        str(gdir),
        "*.graph",
        "metis",
        lambda g: (g.num_nodes(), g.num_edges()),
        out,
        header=["file", "sec", "n", "m"],
    )
    assert [r[0] for r in rows] == ["g0.graph", "g1.graph"]
    assert rows[0][2:] == [4, 2] and rows[1][2:] == [4, 3]
    with open(out) as f:
        tsv = list(csv.reader(f, delimiter="\t"))
    assert tsv[0] == ["file", "sec", "n", "m"] and len(tsv) == 3


def test_extract_largest_component_reexport(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (5, 6)], num_nodes=7)
    big = extract_largest_component(g)
    nodes = {r["node"] for r in big.nodes().collect()}
    assert nodes == {0, 1, 2}


def test_strong_scaling_bookkeeping(spark, tmp_path):
    """Harness bookkeeping with an injected no-churn session factory (the
    session-stop/create path is exercised by tools/scaling_bench.py in
    subprocess isolation — a pytest must not kill the shared session)."""

    def algo(s):
        s.range(1000).agg(F.sum("id")).collect()
        return "sum1k"

    out = str(tmp_path / "scaling.tsv")
    data = strong_scaling(
        algo,
        [2, 4],
        input_title="range1000",
        repetitions=2,
        out_path=out,
        session_factory=lambda n: spark,
    )
    assert len(data) == 4
    assert [d["threads"] for d in data] == [2, 2, 4, 4]
    assert all(d["algo"] == "sum1k" and d["time"] >= 0 for d in data)
    with open(out) as f:
        assert len(f.read().splitlines()) == 5


def test_weak_scaling_pairs(spark):
    def algo(s, n):
        s.range(n).count()
        return f"count{n}"

    data = weak_scaling(
        algo,
        [2, 4],
        [100, 200],
        session_factory=lambda n: spark,
    )
    assert [(d["input"], d["threads"]) for d in data] == [("100", 2), ("200", 4)]
