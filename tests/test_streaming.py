import json

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.streaming.graph_events import (
    EVENT_SCHEMA,
    GraphUpdater,
    apply_events,
    parse_dgs_lines,
    stream_events_from_files,
)


def ev(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_apply_events_fold(spark):
    edges = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    events = ev(spark, [
        (1, "EDGE_ADDITION", 1, 2, 2.0, None),
        (2, "EDGE_WEIGHT_INCREMENT", 1, 2, 0.5, None),
        (3, "EDGE_REMOVAL", 0, 1, 0.0, None),
        (4, "EDGE_ADDITION", 3, 4, 1.0, None),
        (5, "EDGE_REMOVAL", 3, 4, 0.0, None),
        (6, "EDGE_ADDITION", 3, 4, 9.0, None),
    ])
    out = {(r["src"], r["dst"]): r["weight"] for r in apply_events(edges, events).collect()}
    assert out == {(1, 2): 2.5, (3, 4): 9.0}


def test_apply_events_order_independent_of_partitioning(spark):
    edges = spark.createDataFrame([], "src long, dst long, weight double")
    rows = [(i, "EDGE_WEIGHT_UPDATE", 0, 1, float(i), None) for i in range(50)]
    a = apply_events(edges, ev(spark, rows)).collect()
    b = apply_events(edges, ev(spark, rows).repartition(13)).collect()
    assert a == b and a[0]["weight"] == 49.0  # last-writer (max seq) wins


def test_graph_updater_timeline(spark):
    u = GraphUpdater(spark)
    g1 = u.update(ev(spark, [(1, "EDGE_ADDITION", 0, 1, 1.0, None)]))
    g2 = u.update(ev(spark, [(2, "EDGE_ADDITION", 1, 2, 1.0, None),
                             (3, "EDGE_REMOVAL", 0, 1, 0.0, None)]))
    assert u.timeline == [(0, 1), (1, 1)]
    assert [tuple(r) for r in g2.edges.select("src", "dst").collect()] == [(1, 2)]


def test_replay_equals_batch(spark):
    """FIXTURES.md §9 invariant: replaying an event stream yields the same
    edge table as batch construction."""
    batch_edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.5)]
    events = ev(spark, [(i, "EDGE_ADDITION", u, v, w, None)
                        for i, (u, v, w) in enumerate(batch_edges)])
    updater = GraphUpdater(spark)
    g = updater.update(events)
    expected = Graph.from_edge_list(spark, batch_edges, weighted=True)
    assert sorted(map(tuple, g.edges.collect())) == sorted(
        map(tuple, expected.edges.collect())
    )


def test_parse_dgs(spark):
    lines = spark.createDataFrame(
        [(0, "ae 0 1 2.5"), (1, "de 0 1"), (2, "st"), (3, "xx junk")],
        "seq long, value string",
    )
    out = parse_dgs_lines(lines).collect()
    types = [r["type"] for r in out]
    assert types == ["EDGE_ADDITION", "EDGE_REMOVAL", "TIME_STEP"]
    assert out[0]["w"] == 2.5


def test_structured_streaming_ingestion(spark, tmp_path):
    """Real readStream → foreachBatch path over JSON event files."""
    indir = tmp_path / "events"
    indir.mkdir()
    rows = [
        {"seq": 1, "type": "EDGE_ADDITION", "u": 0, "v": 1, "w": 1.0,
         "ts": "2024-01-01T00:00:00.000Z"},
        {"seq": 2, "type": "EDGE_ADDITION", "u": 1, "v": 2, "w": 2.0,
         "ts": "2024-01-01T00:00:01.000Z"},
    ]
    (indir / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    updater = GraphUpdater(spark)
    q = stream_events_from_files(
        spark, str(indir), updater, str(tmp_path / "ckpt")
    )
    q.awaitTermination(60)
    got = sorted(map(tuple, updater.edges.select("src", "dst", "weight").collect()))
    assert got == [(0, 1, 1.0), (1, 2, 2.0)]


def test_dgs_write_parse_roundtrip(spark, tmp_path):
    """write_dgs → parse_dgs_lines reproduces the event structure."""
    import os
    from networkit_spark.streaming.graph_events import (
        EVENT_SCHEMA, parse_dgs_lines, write_dgs,
    )

    rows = [
        (0, "EDGE_ADDITION", 0, 1, 2.0, None),
        (1, "EDGE_ADDITION", 1, 2, 1.0, None),
        (2, "TIME_STEP", None, None, None, None),
        (3, "EDGE_REMOVAL", 0, 1, 2.0, None),
    ]
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    path = str(tmp_path / "events.dgs")
    write_dgs(events, path)

    lines = [
        (i, l) for i, l in enumerate(open(path).read().splitlines())
        if l and not l.startswith("DGS") and not l.startswith("networkit_spark")
    ]
    ldf = spark.createDataFrame(lines, "seq long, value string")
    parsed = parse_dgs_lines(ldf).orderBy("seq").collect()
    assert [(r["type"], r["u"], r["v"]) for r in parsed] == [
        ("EDGE_ADDITION", 0, 1),
        ("EDGE_ADDITION", 1, 2),
        ("TIME_STEP", None, None),
        ("EDGE_REMOVAL", 0, 1),
    ]
    assert parsed[0]["w"] == 2.0


def test_apply_events_increment_on_existing_edge(spark):
    """GraphUpdater.cpp EDGE_WEIGHT_INCREMENT is setWeight(u,v, w(u,v)+dw):
    the fold must seed from the BASE edge state — with a zero seed the
    increment both lost the prior weight and deleted the edge."""
    from networkit_spark.streaming.graph_events import apply_events

    base = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    ev = spark.createDataFrame(
        [(0, "EDGE_WEIGHT_INCREMENT", 1, 2, 0.5, None)], EVENT_SCHEMA
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in apply_events(base, ev).collect()}
    assert got == {(1, 2): 1.5}
    # increment on an ABSENT edge creates it (Graph.cpp:815-819 setWeight)
    ev2 = spark.createDataFrame(
        [(0, "EDGE_WEIGHT_INCREMENT", 3, 4, 2.0, None)], EVENT_SCHEMA
    )
    got2 = {(r["src"], r["dst"]): r["weight"] for r in apply_events(base, ev2).collect()}
    assert got2 == {(1, 2): 1.0, (3, 4): 2.0}
    # removal then increment re-creates at the increment's weight
    ev3 = spark.createDataFrame(
        [
            (0, "EDGE_REMOVAL", 1, 2, 1.0, None),
            (1, "EDGE_WEIGHT_INCREMENT", 1, 2, 0.25, None),
        ],
        EVENT_SCHEMA,
    )
    got3 = {(r["src"], r["dst"]): r["weight"] for r in apply_events(base, ev3).collect()}
    assert got3 == {(1, 2): 0.25}


def test_apply_events_directed_arcs(spark):
    """directed=True keeps arc identity: removing (5,2) must not be
    canonicalized to (2,5) and miss the stored arc."""
    from networkit_spark.streaming.graph_events import apply_events

    base = spark.createDataFrame([(5, 2, 1.0)], "src long, dst long, weight double")
    ev = spark.createDataFrame([(0, "EDGE_REMOVAL", 5, 2, 1.0, None)], EVENT_SCHEMA)
    assert apply_events(base, ev, directed=True).count() == 0
    # adding arc (5,2) keeps its direction
    ev2 = spark.createDataFrame([(0, "EDGE_ADDITION", 7, 3, 2.0, None)], EVENT_SCHEMA)
    rows = apply_events(base, ev2, directed=True).collect()
    assert {(r["src"], r["dst"]) for r in rows} == {(5, 2), (7, 3)}
