"""Gephi interchange — reference ``networkit/gephi/`` analog.

The reference ships three exporters for the Gephi visualization tool:

* ``gephi/pyclient.py:70-100`` — the Graph Streaming protocol: one JSON
  object per line, ``{"an": {id: attrs}}`` / ``{"ae": {id: attrs}}`` /
  ``{"cn": ...}`` / ``{"de": ...}``, CRLF-separated, POSTed to the plugin's
  ``?operation=updateGraph`` endpoint.
* ``gephi/streaming.py:15-220`` — ``GephiStreamingClient``: exports the
  graph (deterministic grid coordinates since Gephi 0.9 forbids coincident
  nodes, streaming.py:60-75), node/edge attribute updates, event streams.
* ``gephi/csv.py:5-17`` — ``exportNodeValues``: an ``id,<name>`` CSV that
  Gephi's data laboratory imports.

Spark-first split: the EVENT STREAM IS A DATAFRAME — every event line is
built JVM-side (``to_json`` over map/struct columns, whole-stage codegen),
so a 10^9-edge export is a distributed write (``events.write.text``), never
a driver loop. Only the two tool-facing sinks funnel through the driver:
the HTTP client (the plugin endpoint is a single socket by nature) streams
batches from ``toLocalIterator`` without materializing the frame, and the
single-file writer exists for tool-sized graphs like the ``.gt``/EPS
writers (sources/formats.py, sources/viz.py precedent).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from ..graph import Graph
from ..plans.order import zip_with_rank

NODE_AREA_SIZE = 2000  # streaming.py:64 — Gephi's default visible extent


def _edge_id(directed: bool) -> Column:
    """streaming.py:46-50 edge naming: ``u->v`` directed, ``min-max`` not."""
    if directed:
        return F.concat_ws("->", F.col("src"), F.col("dst"))
    return F.concat_ws(
        "-", F.least("src", "dst"), F.greatest("src", "dst")
    )


def node_grid(graph: Graph, cache_handle: Optional[list] = None) -> DataFrame:
    """(node, x, y) — the reference's deterministic export grid
    (streaming.py:60-75; Gephi 0.9 forbids coincident nodes): node number k
    (0-based, here the exact global rank by node id — distributed range
    rank, never a single-task window) sits at
    ``((k % side)*step - offset, (k // side)*step - offset)`` with
    ``side = ceil(sqrt(n))``, ``step = 2000/side``, ``offset = 1000``."""
    n = graph.num_nodes()
    if n == 0:
        return graph.nodes().select(
            "node", F.lit(0.0).alias("x"), F.lit(0.0).alias("y")
        ).limit(0)
    side = math.ceil(math.sqrt(n))
    step = NODE_AREA_SIZE / side
    offset = NODE_AREA_SIZE / 2
    ranked = zip_with_rank(
        graph.nodes(),
        [F.col("node").asc()],
        rank_col="_rk",
        cache_handle=cache_handle,
    )
    k = F.col("_rk") - 1
    return ranked.select(
        "node",
        ((k % side) * F.lit(step) - F.lit(offset)).alias("x"),
        (F.floor(k / side) * F.lit(step) - F.lit(offset)).alias("y"),
    )


def node_events(graph: Graph, cache_handle: Optional[list] = None) -> DataFrame:
    """``{"an": {id: {size,r,g,b,x,y}}}`` add-node events (streaming.py:58-75
    with the default attrs of streaming.py:59) at :func:`node_grid`
    coordinates. Returns (node, event) so callers can join more attributes
    before writing."""
    attrs = F.struct(
        F.lit(2.0).alias("size"),
        F.lit(0.6).alias("r"),
        F.lit(0.6).alias("g"),
        F.lit(0.6).alias("b"),
        F.col("x"),
        F.col("y"),
    )
    ev = F.to_json(
        F.create_map(
            F.lit("an"),
            F.create_map(F.col("node").cast("string"), attrs),
        )
    )
    return node_grid(graph, cache_handle=cache_handle).select(
        "node", ev.alias("event")
    )


def edge_events(graph: Graph) -> DataFrame:
    """``{"ae": {id: {source,target,directed}}}`` add-edge events
    (pyclient.py:81-86; one event per stored edge, reference edge ids)."""
    attrs = F.struct(
        F.col("src").cast("string").alias("source"),
        F.col("dst").cast("string").alias("target"),
        F.lit(graph.directed).alias("directed"),
    )
    ev = F.to_json(F.create_map(F.lit("ae"), F.create_map(_edge_id(graph.directed), attrs)))
    return graph.edges.select("src", "dst", ev.alias("event"))


def node_value_events(values: DataFrame, column: str) -> DataFrame:
    """``{"cn": {id: {<column>: value}}}`` change-node events — the
    ``exportNodeValues`` analog (streaming.py:149-170): push a per-node
    attribute (community label, a centrality score) onto an exported graph.
    ``values`` is (node, <column>)."""
    ev = F.to_json(
        F.create_map(
            F.lit("cn"),
            F.create_map(
                F.col("node").cast("string"),
                F.create_map(F.lit(column), F.col(column)),
            ),
        )
    )
    return values.select("node", ev.alias("event"))


def edge_value_events(graph: Graph, values: DataFrame, column: str) -> DataFrame:
    """``{"ce": ...}`` change-edge events (streaming.py:182-208
    exportEdgeValues): per-edge attribute plus Gephi's ``Type`` tag.
    ``values`` is (src, dst, <column>). A struct (not a map) carries the
    attributes so the value keeps its JSON type — pyclient.change_edge
    emits real numbers/bools, and Gephi's data laboratory types columns
    from the first value it sees."""
    etype = "Directed" if graph.directed else "Undirected"
    attrs = F.struct(
        F.col(column),
        F.lit(etype).alias("Type"),
        F.col("src").cast("string").alias("source"),
        F.col("dst").cast("string").alias("target"),
        F.lit(graph.directed).alias("directed"),
    )
    ev = F.to_json(F.create_map(F.lit("ce"), F.create_map(_edge_id(graph.directed), attrs)))
    return values.select("src", "dst", ev.alias("event"))


def graph_events(graph: Graph, cache_handle: Optional[list] = None) -> DataFrame:
    """Full export stream: every add-node event then every add-edge event
    (streaming.py:34-55 exportGraph order). Single ``event`` column.
    Union keeps the node partitions strictly before the edge partitions in
    both ``toLocalIterator`` and part-file order, so nodes-before-edges
    holds WITHOUT a sort — an ``orderBy`` on the two-valued phase key would
    range-shuffle the whole stream into at most two partitions, turning the
    at-scale ``events.write.text`` into two straggler tasks."""
    nodes = node_events(graph, cache_handle=cache_handle).select("event")
    edges = edge_events(graph).select("event")
    return nodes.unionByName(edges)


def write_stream(events: DataFrame, path: str) -> None:
    """Single-file Graph Streaming log (CRLF lines, pyclient.py:70) a Gephi
    master can replay. Driver-side single file — a tool-interchange sink,
    same scale posture as the ``.gt``/EPS writers; at data scale use
    ``events.write.text(dir)`` and concatenate, or stream over HTTP."""
    with open(path, "w", encoding="utf-8") as f:
        for row in events.toLocalIterator():
            f.write(row["event"] + "\r\n")


def export_graph_stream(graph: Graph, path: str) -> None:
    """Convenience: full-graph export to a replayable stream file, with the
    rank cache released once the file is written."""
    handle: list = []
    write_stream(graph_events(graph, cache_handle=handle), path)
    for df in handle:
        df.unpersist()


def export_node_values_csv(values: DataFrame, path: str, column: str) -> None:
    """``gephi/csv.py:5-17`` exportNodeValues: ``id,<column>`` CSV for
    Gephi's data laboratory, rows in node order. Driver-side single file
    (tool interchange); ``values.write.csv`` is the at-scale path."""
    ordered = values.select(
        F.col("node").cast("long"), F.col(column)
    ).orderBy("node")
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"id,{column}\n")
        for row in ordered.toLocalIterator():
            f.write(f"{row[0]},{row[1]}\n")


class GephiStreamingClient:
    """``streaming.py:15`` analog against a running Gephi Streaming plugin.

    Events are generated distributed (the DataFrames above); only the HTTP
    POST is driver-side, streamed in ``batch_size``-line chunks from
    ``toLocalIterator`` — the frame is never collected whole (the plugin
    endpoint is one socket; this is the reference's autoflush batching,
    pyclient.py:58-64, with bounded driver memory)."""

    def __init__(
        self,
        url: str = "http://localhost:8080/workspace0",
        batch_size: int = 10000,
    ):
        self.url = url
        self.batch_size = batch_size
        self.graph_exported = False

    # -- transport ---------------------------------------------------------
    def _post(self, payload: str) -> None:
        import urllib.request

        urllib.request.urlopen(
            self.url + "?operation=updateGraph", payload.encode("utf-8")
        ).read()

    def _send_events(self, events: DataFrame) -> int:
        buf, n_sent = [], 0
        for row in events.toLocalIterator():
            buf.append(row["event"])
            if len(buf) >= self.batch_size:
                self._post("\r\n".join(buf) + "\r\n")
                n_sent += len(buf)
                buf = []
        if buf:
            self._post("\r\n".join(buf) + "\r\n")
            n_sent += len(buf)
        return n_sent

    # -- protocol surface (streaming.py method-for-method) ------------------
    def export_graph(self, graph: Graph) -> int:
        """exportGraph (streaming.py:34-55): clean, nodes, then edges. The
        grid-rank cache is released once the node events are sent."""
        self.clear_graph()
        handle: list = []
        n = self._send_events(
            node_events(graph, cache_handle=handle).select("event")
        )
        for df in handle:
            df.unpersist()
        n += self._send_events(edge_events(graph).select("event"))
        self.graph_exported = True
        return n

    def export_node_values(self, values: DataFrame, column: str) -> int:
        """exportNodeValues (streaming.py:149-170); graph must be exported."""
        if not self.graph_exported:
            raise RuntimeError("export_graph first (streaming.py:156 guard)")
        return self._send_events(node_value_events(values, column).select("event"))

    def export_edge_values(self, graph: Graph, values: DataFrame, column: str) -> int:
        """exportEdgeValues (streaming.py:182-208)."""
        if not self.graph_exported:
            raise RuntimeError("export_graph first (streaming.py:156 guard)")
        return self._send_events(
            edge_value_events(graph, values, column).select("event")
        )

    def export_coordinates(self, layout: DataFrame, scale: float = 1.0) -> int:
        """exportCoordinates (streaming.py:172-180): push (node, x, y) —
        e.g. operators/graphlayout.py output — as two attribute updates."""
        if not self.graph_exported:
            raise RuntimeError("export_graph first (streaming.py:156 guard)")
        sx = layout.select("node", (F.col("x") * scale).alias("x"))
        sy = layout.select("node", (F.col("y") * scale).alias("y"))
        return self._send_events(
            node_value_events(sx, "x").select("event")
        ) + self._send_events(node_value_events(sy, "y").select("event"))

    def clear_graph(self) -> None:
        """clearGraph (streaming.py:210-218): ``{"dn":{"filter":"ALL"}}``."""
        self._post('{"dn": {"filter": "ALL"}}\r\n')
        self.graph_exported = False
