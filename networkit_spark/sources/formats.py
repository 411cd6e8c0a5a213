"""Additional graph IO formats: SNAP, KONECT, MatrixMarket (distributed
line-based parses) and GML / GraphML / GEXF / DOT (single-document
interchange formats, parsed driver-side exactly like the reference does).

Reference: /root/reference/networkit/cpp/io/SNAPGraphReader.cpp:18-120
(tab-separated, '#' comments, first-encounter dense id remap),
KONECTGraphReader.cpp:29-120 ('%' comments, first header line declares
sym/asym + weight mode, 1-based ids), MatrixMarketReader.cpp,
GMLGraphReader.cpp / GMLGraphWriter.cpp (bracketed key-value records),
/root/reference/networkit/GraphMLIO.py and GEXFIO.py (sequential
xml.etree parse/serialize — the reference itself treats these as
single-document formats), DotGraphWriter.cpp.

Design note (scale): SNAP / KONECT / MatrixMarket corpora can be tens of
GB, so those parsers are pure DataFrame line pipelines (spark.read.text →
filter → split → cast) that parallelize over file splits.  GML / GraphML /
GEXF are XML/structured interchange files that are not line-splittable and
in practice only carry small graphs; parsing them on the driver mirrors the
reference's own sequential readers, and the resulting edge list is handed
straight back to Spark.  Dense id remapping uses SORTED token order (same
documented deviation as edgelist.py: first-encounter order is a
sequential-scan concept a distributed reader cannot reproduce).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.order import zip_with_index
from .edgelist import read_metis, write_metis  # noqa: F401 — interchange registry


def _dense_remap(raw: DataFrame) -> DataFrame:
    """(us, vs, weight) string-token edges → (src, dst, weight) dense longs."""
    ids = (
        raw.select(F.col("us").alias("tok"))
        .unionByName(raw.select(F.col("vs").alias("tok")))
        .distinct()
    )
    # numeric-aware sort so '10' follows '9' for the common all-int case
    idmap = zip_with_index(
        ids.withColumn("num", F.col("tok").cast("long")),
        [F.col("num").asc_nulls_last(), F.col("tok")],
        index_col="id",
    ).select("tok", F.col("id").cast("long").alias("id"))
    return (
        raw.join(idmap.withColumnRenamed("tok", "us").withColumnRenamed("id", "src"), "us")
        .join(idmap.withColumnRenamed("tok", "vs").withColumnRenamed("id", "dst"), "vs")
        .select("src", "dst", "weight")
    )


def read_snap(
    spark: SparkSession, path: str, directed: bool = False, remap: bool = True
):
    """SNAPGraphReader analog: whitespace/tab edge list, '#' comments, node
    ids densely remapped (SNAPGraphReader.cpp's mapNodeIds)."""
    from ..graph import Graph

    lines = spark.read.text(path).filter(
        (F.length(F.trim("value")) > 0) & (~F.col("value").startswith("#"))
    )
    p = F.split(F.trim("value"), r"\s+")
    raw = lines.select(
        F.get(p, 0).alias("us"), F.get(p, 1).alias("vs"), F.lit(1.0).alias("weight")
    )
    if remap:
        edges = _dense_remap(raw)
    else:
        edges = raw.select(
            F.col("us").cast("long").alias("src"),
            F.col("vs").cast("long").alias("dst"),
            "weight",
        )
    if not directed:
        edges = (
            edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .distinct()
            .withColumn("weight", F.lit(1.0))
        )
    return Graph(edges, directed=directed, weighted=False)


def write_snap(graph, path: str) -> None:
    """SNAPGraphWriter analog (cpp/io/SNAPGraphWriter.cpp:16-43): whitespace
    edge list ('#' comment lines tolerated by the reader). DISTRIBUTED sink —
    a directory of part files, which ``spark.read.text``/:func:`read_snap`
    accept — unlike the positional single-file interchange writers: the SNAP
    format has no line-order dependence, so every executor writes its own
    partition."""
    graph.edges.select(
        F.concat(
            F.col("src").cast("string"), F.lit("\t"), F.col("dst").cast("string")
        ).alias("value")
    ).write.mode("overwrite").text(path)


def read_konect(spark: SparkSession, path: str, ignore_loops: bool = True):
    """KONECTGraphReader analog: '%' comments; the FIRST header line
    ``% (sym|asym|bip) (unweighted|positive|posweighted|signed|weighted|...)``
    declares directedness and weighting (KONECTGraphReader.cpp:60-95); ids
    are 1-based.  Duplicate unweighted edges collapse (the reference ignores
    them, KONECTGraphReader.cpp's 'positive' note); duplicate weighted edges
    keep their SUM (the mult* interpretation — documented choice)."""
    from ..graph import Graph

    # header: a handful of bytes — one driver read of the first comment line
    first = (
        spark.read.text(path)
        .filter(F.col("value").startswith("%"))
        .limit(1)
        .collect()
    )
    directed, weighted = True, False
    if first:
        toks = first[0]["value"].split()
        if len(toks) >= 2 and toks[1] in ("sym", "bip"):
            directed = False
        if len(toks) >= 3 and toks[2] not in ("unweighted", "positive"):
            weighted = True
    lines = spark.read.text(path).filter(
        (F.length(F.trim("value")) > 0) & (~F.col("value").startswith("%"))
    )
    p = F.split(F.trim("value"), r"\s+")
    edges = lines.select(
        (F.get(p, 0).cast("long") - 1).alias("src"),
        (F.get(p, 1).cast("long") - 1).alias("dst"),
        (
            F.coalesce(F.get(p, 2).cast("double"), F.lit(1.0))
            if weighted
            else F.lit(1.0)
        ).alias("weight"),
    )
    if ignore_loops:
        edges = edges.filter(F.col("src") != F.col("dst"))
    if not directed:
        edges = edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
    edges = (
        edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
        if weighted
        else edges.select("src", "dst").distinct().withColumn("weight", F.lit(1.0))
    )
    return Graph(edges, directed=directed, weighted=weighted)


def read_matrix_market(spark: SparkSession, path: str):
    """MatrixMarketReader analog: ``%%MatrixMarket matrix coordinate ...``
    header ('%' comments), dims line, then 1-based ``i j [v]`` entries.
    Symmetric banner → undirected graph."""
    from ..graph import Graph

    banner = spark.read.text(path).limit(1).collect()[0]["value"].lower()
    symmetric = "symmetric" in banner
    lines = (
        spark.read.text(path)
        .filter((F.length(F.trim("value")) > 0) & (~F.col("value").startswith("%")))
    )
    p = F.split(F.trim("value"), r"\s+")
    body = lines.select(
        F.get(p, 0).cast("long").alias("i"),
        F.get(p, 1).cast("long").alias("j"),
        F.coalesce(F.get(p, 2).cast("double"), F.lit(1.0)).alias("w"),
        F.size(p).alias("ntok"),
    )
    # the dims line is the unique 3-token line equal to (nrows ncols nnz) —
    # drop the first non-comment line by anti-joining its exact content is
    # ambiguous; instead use monotonically increasing file order:
    first_body = body.limit(1).collect()[0]
    n = int(max(first_body["i"], first_body["j"]))
    rows = body.offset(1) if hasattr(body, "offset") else body.subtract(body.limit(1))
    edges = rows.select(
        (F.col("i") - 1).alias("a"), (F.col("j") - 1).alias("b"), F.col("w").alias("weight")
    ).filter(F.col("a") != F.col("b"))
    if symmetric:
        edges = edges.select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"), "weight"
        ).groupBy("src", "dst").agg(F.max("weight").alias("weight"))
    else:
        edges = edges.select(F.col("a").alias("src"), F.col("b").alias("dst"), "weight")
    return Graph(edges, directed=not symmetric, weighted=True, num_nodes=n)


# ---------------------------------------------------------------------------
# driver-side interchange formats (small by nature; reference parses
# sequentially too — GMLGraphReader.cpp, GraphMLIO.py, GEXFIO.py)
# ---------------------------------------------------------------------------

_GML_KV = re.compile(r"\s*(\w+)\s+(\"[^\"]*\"|\S+)")


def read_gml(spark: SparkSession, path: str):
    """GMLGraphReader analog: ``graph [ directed 0|1 node [ id .. ]
    edge [ source .. target .. ] ]``."""
    from ..graph import Graph

    with open(path) as f:
        text = f.read()
    directed = bool(re.search(r"\bdirected\s+1\b", text))
    node_ids = []
    for m in re.finditer(r"node\s*\[(.*?)\]", text, re.S):
        kv = dict(_GML_KV.findall(m.group(1)))
        if "id" in kv:
            node_ids.append(kv["id"])
    edges_raw = []
    for m in re.finditer(r"edge\s*\[(.*?)\]", text, re.S):
        kv = dict(_GML_KV.findall(m.group(1)))
        edges_raw.append(
            (kv["source"], kv["target"], float(kv.get("weight", 1.0)))
        )
    remap = {tok: i for i, tok in enumerate(node_ids)}
    rows = [(remap[a], remap[b], w) for a, b, w in edges_raw]
    if not directed:
        rows = [(min(a, b), max(a, b), w) for a, b, w in rows]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    if not directed:
        edges = edges.groupBy("src", "dst").agg(F.max("weight").alias("weight"))
    return Graph(edges, directed=directed, weighted=False,
                 num_nodes=len(node_ids) or None)


def write_gml(graph, path: str) -> None:
    """GMLGraphWriter analog (GMLGraphWriter.cpp): bracketed records."""
    with open(path, "w") as f:
        f.write("graph\n[\n")
        if graph.directed:
            f.write("  directed 1\n")
        for r in graph.nodes().orderBy("node").toLocalIterator():
            f.write(f"  node\n  [\n    id {r['node']}\n  ]\n")
        for r in graph.edges.orderBy("src", "dst").toLocalIterator():
            f.write(
                f"  edge\n  [\n    source {r['src']}\n    target {r['dst']}\n  ]\n"
            )
        f.write("]\n")


def read_graphml(spark: SparkSession, path: str):
    """GraphMLReader analog (/root/reference/networkit/GraphMLIO.py):
    xml.etree parse of <node id=..>/<edge source=.. target=..>; honors
    edgedefault and a double edge-weight key if declared."""
    from ..graph import Graph

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.parse(path).getroot()

    def findall(el, tag):
        return el.findall(f"g:{tag}", ns) or el.findall(tag)

    graph_el = (findall(root, "graph") or [root])[0]
    directed = graph_el.get("edgedefault", "undirected") == "directed"
    weight_keys = {
        k.get("id")
        for k in findall(root, "key")
        if k.get("for") == "edge" and k.get("attr.type") in ("double", "float")
    }
    node_ids = [n.get("id") for n in findall(graph_el, "node")]
    remap = {tok: i for i, tok in enumerate(node_ids)}
    rows = []
    for e in findall(graph_el, "edge"):
        w = 1.0
        for d in findall(e, "data"):
            if d.get("key") in weight_keys:
                w = float(d.text)
        a, b = remap[e.get("source")], remap[e.get("target")]
        if not directed:
            a, b = min(a, b), max(a, b)
        rows.append((a, b, w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    weighted = bool(weight_keys)
    return Graph(edges, directed=directed, weighted=weighted,
                 num_nodes=len(node_ids) or None)


def write_graphml(graph, path: str) -> None:
    """GraphMLWriter analog (GraphMLIO.py GraphMLWriter.write)."""
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
    ]
    if graph.weighted:
        lines.append(
            '  <key id="d1" for="edge" attr.name="weight" attr.type="double"/>'
        )
    ed = "directed" if graph.directed else "undirected"
    lines.append(f'  <graph id="G" edgedefault="{ed}">')
    for r in graph.nodes().orderBy("node").toLocalIterator():
        lines.append(f'    <node id="n{r["node"]}"/>')
    for i, r in enumerate(graph.edges.orderBy("src", "dst").toLocalIterator()):
        if graph.weighted:
            lines.append(
                f'    <edge id="e{i}" source="n{r["src"]}" target="n{r["dst"]}">'
                f'<data key="d1">{r["weight"]}</data></edge>'
            )
        else:
            lines.append(
                f'    <edge id="e{i}" source="n{r["src"]}" target="n{r["dst"]}"/>'
            )
    lines += ["  </graph>", "</graphml>", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def read_gexf(spark: SparkSession, path: str):
    """GEXFReader analog (/root/reference/networkit/GEXFIO.py): static
    GEXF — <nodes><node id/></nodes>, <edges><edge source target [weight]/>."""
    from ..graph import Graph

    root = ET.parse(path).getroot()

    def rfind(el, tag):
        out = []
        for child in el.iter():
            if child.tag.endswith(tag):
                out.append(child)
        return out

    graph_el = rfind(root, "graph")[0]
    directed = graph_el.get("defaultedgetype", "undirected") == "directed"
    node_ids = [n.get("id") for n in rfind(graph_el, "node")]
    remap = {tok: i for i, tok in enumerate(node_ids)}
    rows, weighted = [], False
    for e in rfind(graph_el, "edge"):
        w = e.get("weight")
        weighted = weighted or w is not None
        a, b = remap[e.get("source")], remap[e.get("target")]
        if not directed:
            a, b = min(a, b), max(a, b)
        rows.append((a, b, float(w) if w is not None else 1.0))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(edges, directed=directed, weighted=weighted,
                 num_nodes=len(node_ids) or None)


def write_gexf(graph, path: str) -> None:
    """GEXFWriter analog (GEXFIO.py): static single-mode GEXF 1.2."""
    ed = "directed" if graph.directed else "undirected"
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">',
        f'  <graph mode="static" defaultedgetype="{ed}">',
        "    <nodes>",
    ]
    for r in graph.nodes().orderBy("node").toLocalIterator():
        lines.append(f'      <node id="{r["node"]}"/>')
    lines += ["    </nodes>", "    <edges>"]
    for i, r in enumerate(graph.edges.orderBy("src", "dst").toLocalIterator()):
        wattr = f' weight="{r["weight"]}"' if graph.weighted else ""
        lines.append(
            f'      <edge id="{i}" source="{r["src"]}" target="{r["dst"]}"{wattr}/>'
        )
    lines += ["    </edges>", "  </graph>", "</gexf>", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def write_dot(graph, path: str) -> None:
    """DotGraphWriter analog (DotGraphWriter.cpp): ``graph G { u -- v; }``."""
    sep = "->" if graph.directed else "--"
    kind = "digraph" if graph.directed else "graph"
    with open(path, "w") as f:
        f.write(f"{kind} G {{\n")
        for r in graph.edges.orderBy("src", "dst").toLocalIterator():
            f.write(f"  {r['src']} {sep} {r['dst']};\n")
        f.write("}\n")


# -- graph-tool binary (.gt) ------------------------------------------------

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _gt_width(n: int) -> int:
    """GraphToolBinaryWriter.cpp:35-45 adjacency int width from node count."""
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def write_graphtool_binary(graph, path: str) -> None:
    """graph-tool binary writer (GraphToolBinaryWriter.cpp:18-120):
    magic ⛾ gt + version 1 + little-endian byte, empty comment, directed
    byte, u64 node count, then per node a u64 out-degree and width-sized
    neighbor ids (undirected: only neighbors v <= u, like the reference).

    The byte stream is inherently sequential (variable-width, no offsets),
    so serialization is driver-side — .gt is a tool-interchange format, not
    a data-scale sink (the engine's native interchange is parquet)."""
    import struct

    from pyspark.sql import functions as F

    # .gt stores nodes positionally as 0..n-1 — densify gapped ids first
    # (sorted-id rank), otherwise nodes with id >= n are silently dropped and
    # wide neighbor ids overflow the int width (the reference only ever sees
    # dense ids; GraphToolBinaryWriter.cpp indexes by position).
    ids = sorted(r["node"] for r in graph.nodes().collect())
    n = len(ids)
    dense = {u: i for i, u in enumerate(ids)}
    sym = graph.sym().select("src", "dst")
    adj_raw = {
        r["src"]: r["nbrs"]
        for r in sym.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .collect()
    }
    adj: dict = {}
    for u, nbrs in adj_raw.items():
        du = dense[u]
        dn = [dense[v] for v in nbrs]
        if not graph.directed:
            dn = [v for v in dn if v <= du]
        adj[du] = sorted(dn)
    width = _gt_width(n)
    fmt = {1: "<B", 2: "<H", 4: "<I", 8: "<Q"}[width]
    with open(path, "wb") as f:
        f.write(_GT_MAGIC + bytes([0x01, 0x00]))
        f.write(struct.pack("<Q", 0))  # empty comment
        f.write(bytes([0x01 if graph.directed else 0x00]))
        f.write(struct.pack("<Q", n))
        for u in range(n):
            nbrs = adj.get(u, [])
            f.write(struct.pack("<Q", len(nbrs)))
            for v in nbrs:
                f.write(struct.pack(fmt, v))


def read_graphtool_binary(spark, path: str):
    """graph-tool binary reader (GraphToolBinaryReader.cpp:18-135). Returns
    a Graph; undirected files store each edge once at the higher endpoint."""
    import struct

    from ..graph import Graph

    with open(path, "rb") as f:
        data = f.read()
    if data[:6] != _GT_MAGIC or data[6] != 0x01:
        raise ValueError("not a graph-tool binary file (bad header)")
    little = data[7] == 0x00
    if not little:
        raise ValueError("big-endian .gt files not supported")
    off = 8
    (clen,) = struct.unpack_from("<Q", data, off)
    off += 8 + clen
    directed = data[off] == 0x01
    off += 1
    (n,) = struct.unpack_from("<Q", data, off)
    off += 8
    width = _gt_width(n)
    fmt = {1: "<B", 2: "<H", 4: "<I", 8: "<Q"}[width]
    rows = []
    for u in range(n):
        (deg,) = struct.unpack_from("<Q", data, off)
        off += 8
        for _ in range(deg):
            (v,) = struct.unpack_from(fmt, data, off)
            off += width
            rows.append((u, int(v), 1.0))
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    if not directed:
        df = df.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).dropDuplicates(["src", "dst"])
    return Graph(df, directed=directed, weighted=False, num_nodes=n)
