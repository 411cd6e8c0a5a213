"""Dynamic-graph event streams — the reference's dynamics surface.

Reference: /root/reference/networkit/cpp/dynamics/GraphEvent.h:24-39 (event
enum + (u, v, w)), DGSStreamParser.h:23-39 (DGS text stream → events),
GraphUpdater.h:19-36 (apply events, record size timeline).

Spark mapping: events are rows ``(seq BIGINT, type STRING, u BIGINT,
v BIGINT, w DOUBLE, ts TIMESTAMP)``; batch application is a deterministic
fold expressed relationally (last-writer-wins by max seq per edge);
streaming ingestion wraps the same apply in ``foreachBatch`` over
``readStream``. The reference's TIME_STEP is the only time model (no
watermarks there, Graph.h:765-771); here TIME_STEP maps to event-time and
the Structured-Streaming path adds a real watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc

EVENT_TYPES = [
    "NODE_ADDITION", "NODE_REMOVAL", "NODE_RESTORATION",
    "EDGE_ADDITION", "EDGE_REMOVAL",
    "EDGE_WEIGHT_UPDATE", "EDGE_WEIGHT_INCREMENT", "TIME_STEP",
]

EVENT_SCHEMA = "seq long, type string, u long, v long, w double, ts timestamp"


def apply_events(
    edges: DataFrame, events: DataFrame, directed: bool = False
) -> DataFrame:
    """Fold an event batch into an edge table (src, dst, weight).

    Deterministic independent of partitioning: per (u, v) the outcome is the
    in-seq-order fold of that edge's events SEEDED WITH THE EDGE'S PRIOR
    STATE in ``edges`` — GraphUpdater.cpp's EDGE_WEIGHT_INCREMENT is
    ``setWeight(u, v, weight(u,v) + w)``, so an increment on a pre-existing
    edge must add to the stored weight, not to a zero seed (a zero seed
    would also leave ``exists=False`` and silently DELETE the edge).
    ADDITION/UPDATE set the weight, INCREMENT adds, REMOVAL deletes.
    Implemented as a grouped sort-fold joined against the base table — one
    shuffle on the edge key (the key the edge table is stored by, so at
    scale this is a co-partitioned merge, the relational equivalent of
    Iceberg MERGE INTO in GraphUpdater.update, GraphUpdater.h:25).

    ``directed=True`` keeps (u, v) as an arc key; undirected events
    canonicalize to (least, greatest) like the canonical edge store.

    NODE_* events have no edge effect by REFERENCE semantics —
    ``Graph::removeNode`` (Graph.cpp:509-519) requires the node to already
    be isolated, so removal/restoration only toggles node existence, which
    an edge-derived table does not carry. They are ignored here."""
    if directed:
        key = [F.col("u").alias("src"), F.col("v").alias("dst")]
    else:
        key = [F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")]
    ev = events.filter(
        F.col("type").isin("EDGE_ADDITION", "EDGE_REMOVAL",
                           "EDGE_WEIGHT_UPDATE", "EDGE_WEIGHT_INCREMENT")
    ).select(*key, "seq", "type", "w")
    gathered = ev.groupBy("src", "dst").agg(
        F.array_sort(F.collect_list(F.struct("seq", "type", "w"))).alias("evs")
    )
    seeded = gathered.join(
        edges.select("src", "dst", F.col("weight").alias("w0")),
        ["src", "dst"],
        "left",
    )
    folded = seeded.select(
        "src",
        "dst",
        F.aggregate(
            "evs",
            F.struct(
                F.col("w0").isNotNull().alias("exists"),
                F.coalesce("w0", F.lit(0.0)).alias("weight"),
            ),
            lambda acc, e: F.when(
                e["type"] == "EDGE_REMOVAL",
                F.struct(F.lit(False).alias("exists"), F.lit(0.0).alias("weight")),
            ).when(
                # setWeight on a nonexisting edge CREATES it
                # (Graph.cpp:815-819), so an increment always leaves the
                # edge alive at prior-weight + w (prior = 0 when absent)
                e["type"] == "EDGE_WEIGHT_INCREMENT",
                F.struct(
                    F.lit(True).alias("exists"),
                    (acc["weight"] + e["w"]).alias("weight"),
                ),
            ).otherwise(
                F.struct(F.lit(True).alias("exists"), e["w"].alias("weight"))
            ),
        ).alias("state"),
    )
    delta_alive = folded.filter(F.col("state.exists")).select(
        "src", "dst", F.col("state.weight").alias("weight")
    )
    touched = folded.select("src", "dst")
    untouched = edges.join(touched, ["src", "dst"], "left_anti")
    return untouched.unionByName(delta_alive)


class GraphUpdater:
    """GraphUpdater analog: holds the current edge table; ``update`` applies
    a batch and appends to the size timeline (GraphUpdater.h:28 size
    timeline)."""

    def __init__(self, spark: SparkSession, edges: DataFrame | None = None):
        self.spark = spark
        self.edges = (
            edges if edges is not None
            else spark.createDataFrame([], "src long, dst long, weight double")
        ).transform(_cc)
        self.timeline: list[tuple[int, int]] = []

    def update(self, events: DataFrame) -> Graph:
        self.edges = apply_events(self.edges, events).transform(_cc)
        m = self.edges.count()
        self.timeline.append((len(self.timeline), m))
        return Graph(self.edges, directed=False, weighted=True)


def parse_dgs_lines(lines: DataFrame) -> DataFrame:
    """DGSStreamParser analog over a DataFrame of text lines with a ``seq``
    column: ``ae <id> <u> <v> [w]`` / ``de <id>`` simplified to
    ``ae u v [w]``, ``de u v``, ``st`` (time step)."""
    p = F.split(F.trim("value"), r"\s+")
    return lines.select(
        F.col("seq"),
        F.when(F.get(p, 0) == "ae", "EDGE_ADDITION")
        .when(F.get(p, 0) == "de", "EDGE_REMOVAL")
        .when(F.get(p, 0) == "st", "TIME_STEP")
        .otherwise("UNKNOWN").alias("type"),
        F.get(p, 1).cast("long").alias("u"),
        F.get(p, 2).cast("long").alias("v"),
        F.coalesce(F.get(p, 3).cast("double"), F.lit(1.0)).alias("w"),
        F.current_timestamp().alias("ts"),
    ).filter(F.col("type") != "UNKNOWN")


def stream_events_from_files(
    spark: SparkSession,
    input_dir: str,
    updater: GraphUpdater,
    checkpoint_dir: str,
):
    """Structured-Streaming ingestion: JSON event files → watermarked stream
    → foreachBatch(apply). Returns the StreamingQuery (caller stops it).
    At scale the sink would be MERGE INTO an Iceberg edge table; the fold
    semantics in apply_events are identical."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(input_dir)
        .withWatermark("ts", "10 seconds")
    )

    def handle(batch_df: DataFrame, batch_id: int):
        if not batch_df.isEmpty():
            updater.update(batch_df)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window event aggregation (streaming-compatible: works on a
    readStream DataFrame with the watermark already applied)."""
    return events.groupBy(F.window("ts", window), "type").agg(
        F.count("*").alias("n"), F.sum("w").alias("total_w")
    )


def write_dgs(events: DataFrame, path: str) -> None:
    """DGSWriter.cpp analog: serialize an event batch back to DGS lines in
    seq order (``ae u v w`` / ``de u v`` / ``st``). Driver-side file write —
    DGS is a line protocol for tool interchange, not a data-scale sink; the
    cluster-scale event sink is the parquet/Iceberg event table."""
    rows = events.orderBy("seq").collect()
    with open(path, "w") as f:
        f.write("DGS004\nnetworkit_spark 0 0\n")
        for r in rows:
            if r["type"] == "EDGE_ADDITION":
                f.write(f"ae {r['u']} {r['v']} {r['w']}\n")
            elif r["type"] == "EDGE_REMOVAL":
                f.write(f"de {r['u']} {r['v']}\n")
            elif r["type"] == "TIME_STEP":
                f.write("st\n")
