"""Gephi interchange (sources/gephi.py) and drawing-task data products
(viztasks.py) — reference networkit/gephi/ + networkit/viztasks.py parity.

Protocol checks parse the emitted JSON back (the Gephi Streaming plugin is a
JSON-lines consumer, so round-tripping through json.loads IS the contract);
the HTTP client is exercised against an in-process http.server capturing the
POST bodies the plugin would receive.
"""

import json
import math
import threading

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.sources import gephi


def _square(spark, directed=False):
    # 5 nodes: a 4-cycle 0-1-2-3 plus a pendant 4 hanging off node 0
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 1.0), (0, 4, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    return Graph(df, directed=directed, weighted=True)


# -- grid placement (streaming.py:60-75) ------------------------------------

def test_node_grid_is_reference_grid(spark):
    g = _square(spark)
    rows = {r["node"]: (r["x"], r["y"]) for r in gephi.node_grid(g).collect()}
    n = 5
    side = math.ceil(math.sqrt(n))  # 3
    step = 2000 / side
    for k, node in enumerate(sorted(rows)):
        assert rows[node] == (
            (k % side) * step - 1000,
            (k // side) * step - 1000,
        )


def test_node_grid_coordinates_distinct(spark):
    g = _square(spark)
    pts = [(r["x"], r["y"]) for r in gephi.node_grid(g).collect()]
    assert len(set(pts)) == len(pts)  # Gephi 0.9: no coincident nodes


# -- event JSON protocol (pyclient.py:70-100) --------------------------------

def test_node_events_parse_with_default_attrs(spark):
    g = _square(spark)
    evs = [json.loads(r["event"]) for r in gephi.node_events(g).collect()]
    assert len(evs) == 5
    for ev in evs:
        assert set(ev) == {"an"}
        (nid, attrs), = ev["an"].items()
        assert int(nid) in range(5)
        assert attrs["size"] == 2.0
        assert attrs["r"] == attrs["g"] == attrs["b"] == 0.6
        assert "x" in attrs and "y" in attrs


def test_edge_events_undirected_ids(spark):
    g = _square(spark)
    evs = [json.loads(r["event"]) for r in gephi.edge_events(g).collect()]
    ids = sorted(next(iter(e["ae"])) for e in evs)
    assert ids == ["0-1", "0-3", "0-4", "1-2", "2-3"]
    for e in evs:
        attrs = next(iter(e["ae"].values()))
        assert attrs["directed"] is False
        assert {attrs["source"], attrs["target"]} <= {str(i) for i in range(5)}


def test_edge_events_directed_ids(spark):
    g = _square(spark, directed=True)
    evs = [json.loads(r["event"]) for r in gephi.edge_events(g).collect()]
    ids = sorted(next(iter(e["ae"])) for e in evs)
    assert ids == ["0->1", "0->3", "0->4", "1->2", "2->3"]
    assert all(next(iter(e["ae"].values()))["directed"] is True for e in evs)


def test_node_value_events_change_node(spark):
    g = _square(spark)
    vals = g.degrees().withColumnRenamed("degree", "community")
    evs = [
        json.loads(r["event"])
        for r in gephi.node_value_events(vals, "community").collect()
    ]
    got = {int(next(iter(e["cn"]))): next(iter(e["cn"].values()))["community"]
           for e in evs}
    assert got == {0: 3, 1: 2, 2: 2, 3: 2, 4: 1}


def test_graph_events_nodes_before_edges(spark):
    g = _square(spark)
    kinds = [
        next(iter(json.loads(r["event"])))
        for r in gephi.graph_events(g).collect()
    ]
    assert kinds == ["an"] * 5 + ["ae"] * 5


def test_write_stream_crlf_file(spark, tmp_path):
    g = _square(spark)
    path = str(tmp_path / "stream.json")
    gephi.write_stream(gephi.graph_events(g), path)
    raw = open(path, "rb").read()
    lines = raw.decode("utf-8").split("\r\n")
    assert lines[-1] == ""  # trailing CRLF like pyclient.py:70
    assert len(lines) == 11
    json.loads(lines[0])


# -- csv exporter (gephi/csv.py:5-17) ----------------------------------------

def test_export_node_values_csv(spark, tmp_path):
    g = _square(spark)
    path = str(tmp_path / "vals.csv")
    gephi.export_node_values_csv(g.degrees(), path, "degree")
    lines = open(path).read().splitlines()
    assert lines[0] == "id,degree"
    assert lines[1:] == ["0,3", "1,2", "2,2", "3,2", "4,1"]


# -- HTTP client against a live capture server -------------------------------

@pytest.fixture()
def capture_server():
    from http.server import BaseHTTPRequestHandler, HTTPServer

    bodies = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            bodies.append(self.rfile.read(n).decode("utf-8"))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/workspace0", bodies
    srv.shutdown()


def test_streaming_client_export_graph(spark, capture_server):
    url, bodies = capture_server
    g = _square(spark)
    client = gephi.GephiStreamingClient(url=url, batch_size=3)
    n = client.export_graph(g)
    assert n == 10 and client.graph_exported
    events = [
        json.loads(line)
        for body in bodies
        for line in body.split("\r\n")
        if line
    ]
    # clean + 5 an + 5 ae, with batching at 3 forcing multiple POSTs
    assert [next(iter(e)) for e in events].count("an") == 5
    assert [next(iter(e)) for e in events].count("ae") == 5
    assert events[0] == {"dn": {"filter": "ALL"}}
    assert len(bodies) >= 4


def test_streaming_client_value_and_coordinate_updates(spark, capture_server):
    url, bodies = capture_server
    g = _square(spark)
    client = gephi.GephiStreamingClient(url=url)
    with pytest.raises(RuntimeError):
        client.export_node_values(g.degrees(), "degree")
    client.export_graph(g)
    assert client.export_node_values(g.degrees(), "degree") == 5
    layout = gephi.node_grid(g)
    assert client.export_coordinates(layout, scale=2.0) == 10
    cn = [
        json.loads(line)
        for body in bodies
        for line in body.split("\r\n")
        if line and '"cn"' in line
    ]
    xs = {
        int(next(iter(e["cn"]))): next(iter(e["cn"].values()))["x"]
        for e in cn
        if "x" in next(iter(e["cn"].values()))
    }
    grid = {r["node"]: r["x"] for r in layout.collect()}
    assert xs == {k: 2.0 * v for k, v in grid.items()}


# -- viztasks data products ---------------------------------------------------

def test_draw_graph_data_sizes(spark):
    from networkit_spark.viztasks import draw_graph_data

    g = _square(spark)
    sizes = {r["node"]: r["size"] for r in draw_graph_data(g).collect()}
    # n-1 = 4 (DegreeCentrality.cpp maximum()); deg: 3,2,2,2,1
    assert sizes == {
        0: 30 + 270 * 3 / 4,
        1: 30 + 270 * 2 / 4,
        2: 30 + 270 * 2 / 4,
        3: 30 + 270 * 2 / 4,
        4: 30 + 270 * 1 / 4,
    }


def test_draw_community_graph_data(spark):
    from networkit_spark.viztasks import draw_community_graph_data

    g = _square(spark)
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 4)], "node long, label long"
    )
    coarse, sizes = draw_community_graph_data(g, labels)
    smap = {r["label"]: r["size"] for r in sizes.collect()}
    assert smap == {0: 30 + 470 * 4 / 4, 4: 30 + 470 * 1 / 4}
    ce = {
        (r["src"], r["dst"]): r["weight"] for r in coarse.edges.collect()
    }
    # 4 intra edges collapse into the 0-0 self-loop, 0-4 pendant survives
    assert ce == {(0, 0): 4.0, (0, 4): 1.0}


def test_coloring_to_color_list(spark):
    from networkit_spark.viztasks import coloring_to_color_list

    colors = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 0), (3, 1)], "node long, color long"
    )
    got = {r["node"]: r["color"] for r in coloring_to_color_list(colors).collect()}
    assert got == {0: 0.0, 1: 0.5, 2: 0.0, 3: 0.5}


def test_graph_events_stays_distributed(spark):
    """The full export stream must not collapse into a 2-partition sort —
    union keeps node partitions before edge partitions without a shuffle."""
    g = _square(spark)
    ev = gephi.graph_events(g)
    plan = ev._jdf.queryExecution().executedPlan().toString()
    # zip_with_rank's per-partition window sort (hashpartitioning on _zpid)
    # is fine; a GLOBAL sort on the 2-valued phase key (rangepartitioning)
    # would collapse the stream into <=2 partitions
    assert "rangepartitioning(_phase" not in plan
    assert ev.rdd.getNumPartitions() > 2


def test_edge_value_events_keep_json_types(spark):
    g = _square(spark)
    w = g.edges.select("src", "dst", F.col("weight").alias("w"))
    evs = [
        json.loads(r["event"])
        for r in gephi.edge_value_events(g, w, "w").collect()
    ]
    attrs = next(iter(evs[0]["ce"].values()))
    assert attrs["w"] == 1.0 and isinstance(attrs["w"], float)
    assert attrs["directed"] is False
    assert attrs["Type"] == "Undirected"


def test_export_graph_releases_rank_cache(spark, capture_server):
    url, _ = capture_server
    g = _square(spark)
    client = gephi.GephiStreamingClient(url=url)
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    client.export_graph(g)
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after <= before  # grid-rank cache was unpersisted


def test_export_graph_stream_file(spark, tmp_path):
    path = str(tmp_path / "full.jsonl")
    gephi.export_graph_stream(_square(spark), path)
    raw = open(path, "rb").read().decode("utf-8")
    lines = [l for l in raw.split("\r\n") if l]
    assert len(lines) == 10
