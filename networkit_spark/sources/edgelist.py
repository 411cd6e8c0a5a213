"""Edge-list readers/writers — the reference's main IO surface.

Reference: /root/reference/networkit/cpp/io/EdgeListReader.{h,cpp} (~230 LoC):
``readContinuous`` (two-pass max-id scan then addEdge, id remap ``u -
firstNode``, comment-line skip at EdgeListReader.cpp:61) and
``readNonContinuous`` (string ids mapped to dense ints via an ordered map,
EdgeListReader.h:59-66). Format registry: networkit/graphio.py:35-55
(EdgeListSpaceZero/One, EdgeListTabZero/One, EdgeListCommaOne, SNAP…).

Spark mapping: ``spark.read.text`` → comment filter → split → cast. The
two-pass size scan is unnecessary (no preallocated adjacency). Deviation
from the reference, documented: non-continuous id assignment is by SORTED
first token order (row_number over ordered distinct ids) rather than
first-encounter order — encounter order is a sequential-scan concept that a
distributed reader cannot (and should not) reproduce; sorted order is
deterministic and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.order import zip_with_index


def read_edge_list(
    spark: SparkSession,
    path: str,
    separator: str = "\t",
    first_node: int = 0,
    comment_prefix: str = "#",
    continuous: bool = True,
    directed: bool = False,
    weighted: bool = False,
):
    """Returns a Graph. Lines: ``u<sep>v[<sep>w]``; ids offset by
    ``first_node`` when continuous, else arbitrary tokens densely remapped."""
    from ..graph import Graph

    lines = spark.read.text(path).filter(
        (F.length(F.trim("value")) > 0)
        & (~F.col("value").startswith(comment_prefix))
    )
    # split on the separator or runs of whitespace when separator is a space
    sep = r"\s+" if separator == " " else separator
    parts = lines.select(F.split(F.trim("value"), sep).alias("p"))
    raw = parts.select(
        F.get("p", 0).alias("us"),
        F.get("p", 1).alias("vs"),
        (
            F.coalesce(F.get("p", 2).cast("double"), F.lit(1.0))
            if weighted
            else F.lit(1.0)
        ).alias("weight"),
    )
    if continuous:
        edges = raw.select(
            (F.col("us").cast("long") - first_node).alias("src"),
            (F.col("vs").cast("long") - first_node).alias("dst"),
            "weight",
        )
    else:
        ids = (
            raw.select(F.col("us").alias("tok"))
            .unionByName(raw.select(F.col("vs").alias("tok")))
            .distinct()
        )
        idmap = zip_with_index(ids, ["tok"], index_col="id").select(
            "tok", F.col("id").cast("long").alias("id")
        )
        edges = (
            raw.join(idmap.withColumnRenamed("tok", "us").withColumnRenamed("id", "src"), "us")
            .join(idmap.withColumnRenamed("tok", "vs").withColumnRenamed("id", "dst"), "vs")
            .select("src", "dst", "weight")
        )
    if not directed:
        edges = (
            edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
    return Graph(edges, directed=directed, weighted=weighted)


def write_edge_list(
    graph_edges: DataFrame,
    path: str,
    separator: str = "\t",
    first_node: int = 0,
    weighted: bool = False,
) -> None:
    """EdgeListWriter analog (cpp/io/EdgeListWriter.cpp): one ``u<sep>v[<sep>w]``
    line per edge."""
    cols = [
        (F.col("src") + first_node).cast("string"),
        F.lit(separator),
        (F.col("dst") + first_node).cast("string"),
    ]
    if weighted:
        cols += [F.lit(separator), F.col("weight").cast("string")]
    graph_edges.select(F.concat(*cols).alias("value")).write.mode("overwrite").text(path)


def read_metis(spark: SparkSession, path: str):
    """METIS adjacency format (cpp/io/METISGraphReader.cpp, METISParser.cpp:
    28-60): header ``n m [fmt]``; line i holds the 1-based neighbor list of
    node i-1. Line order matters, so attach deterministic line numbers via
    zipWithIndex (stable for a single text file)."""
    from ..graph import Graph

    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(rdd, ["line", "lineno"]).filter(
        ~F.col("line").startswith("%")
    )
    first = df.orderBy("lineno").limit(1)
    body = df.join(first.select("lineno"), "lineno", "left_anti")
    numbered = zip_with_index(body, ["lineno"], index_col="src").select(
        F.col("src").cast("long").alias("src"),
        F.split(F.trim("line"), r"\s+").alias("nbrs"),
    )
    edges = (
        numbered.select("src", F.explode("nbrs").alias("v"))
        .filter(F.length("v") > 0)
        .select("src", (F.col("v").cast("long") - 1).alias("dst"))
        .filter(F.col("dst") >= 0)
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    n = int(first.select(F.split(F.trim("line"), r"\s+")[0].cast("long")).collect()[0][0])
    return Graph(edges, directed=False, weighted=False, num_nodes=n)


def write_metis(graph, path: str) -> None:
    """METISGraphWriter analog (cpp/io/METISGraphWriter.cpp:16-40): header
    ``n m``, then line i holds the 1-based neighbor list of dense node i-1.
    Node ids are densely remapped in sorted order before serializing — the
    positional format cannot represent gapped ids (same rule as
    ``write_graphtool_binary``). Driver-side single-file writer like the
    other interchange writers: the format is line-positional, so rows must
    be emitted in node order from one process."""
    nodes = [r["node"] for r in graph.nodes().orderBy("node").toLocalIterator()]
    remap = {u: i for i, u in enumerate(nodes)}
    adj: dict = {}
    for r in graph.sym().select("src", "dst").toLocalIterator():
        adj.setdefault(remap[r["src"]], []).append(remap[r["dst"]])
    n = len(nodes)
    m = sum(len(v) for v in adj.values()) // 2
    with open(path, "w") as f:
        f.write(f"{n} {m}\n")
        for i in range(n):
            f.write(" ".join(str(j + 1) for j in sorted(adj.get(i, []))) + "\n")


def write_partition(labels: DataFrame, path: str) -> None:
    """PartitionWriter analog — plain parquet of (node, label)."""
    labels.write.mode("overwrite").parquet(path)


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
