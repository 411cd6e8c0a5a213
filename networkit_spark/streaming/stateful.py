"""Custom stateful streaming operator: per-node degree/strength maintained
with ``applyInPandasWithState`` over the GraphEvent stream.

The foreachBatch path (graph_events.py GraphUpdater) re-folds each batch
into the edge table; this operator instead keeps O(1) *state per node* inside
Structured Streaming's state store — the Spark-native analog of the
reference's in-place ``Graph.addEdge/removeEdge`` degree bookkeeping
(cpp/graph/Graph.cpp) driven by GraphEvent batches (GraphUpdater.cpp:16-44).

Semantics: the event log is edge-consistent (a REMOVAL carries the weight
it removes, as produced by graph-diff event generators and guaranteed by
apply_events' fold) and uses the DELTA algebra only — ADDITION / REMOVAL /
EDGE_WEIGHT_INCREMENT. ``EDGE_WEIGHT_UPDATE`` (absolute set) is
REJECTED, not ignored: per-node state cannot know the edge's prior weight,
so silently passing it through would permanently diverge from the folded
graph. Producers lower an absolute update to an INCREMENT of
``new − old`` (they know the old weight) or to REMOVAL+ADDITION. Under
that algebra, after any prefix of batches the emitted (node, degree, wdeg)
rows equal a from-scratch recompute on the folded graph — asserted in
tests/test_stateful_streaming.py.

State is keyed by node and partitioned by Spark's state store — at web
scale each executor holds its key range's state, no driver participation,
and the per-batch work is proportional to the TOUCHED nodes only (update
output mode emits only re-keyed groups).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "node long, degree long, wdeg double, updates long"
STATE_SCHEMA = "degree long, wdeg double, updates long"


def _event_deltas(events: DataFrame) -> DataFrame:
    """Explode each edge event into per-endpoint (node, dd, dw) deltas.
    ADDITION: +1 degree, +w strength; REMOVAL: -1, -w;
    EDGE_WEIGHT_INCREMENT: 0, +w. EDGE_WEIGHT_UPDATE poisons the stream
    with a runtime error (module doc: absolute sets are outside the delta
    algebra — lower them upstream); node/TIME_STEP events carry no mass."""
    guard = F.when(
        F.col("type") == "EDGE_WEIGHT_UPDATE",
        F.raise_error(
            F.lit(
                "streaming_degree_tracker: EDGE_WEIGHT_UPDATE is not "
                "representable as a per-node delta — lower it to "
                "EDGE_WEIGHT_INCREMENT(new - old) upstream"
            )
        ).cast("int"),
    )
    sign = (
        F.when(F.col("type") == "EDGE_ADDITION", F.lit(1))
        .when(F.col("type") == "EDGE_REMOVAL", F.lit(-1))
        .otherwise(F.lit(0))
    )
    dw = (
        F.when(F.col("type") == "EDGE_ADDITION", F.col("w"))
        .when(F.col("type") == "EDGE_REMOVAL", -F.col("w"))
        .when(F.col("type") == "EDGE_WEIGHT_INCREMENT", F.col("w"))
        .otherwise(F.lit(0.0))
    )
    base = events.select(
        F.col("u"),
        F.col("v"),
        F.coalesce(guard, sign).alias("dd"),
        dw.alias("dw"),
    ).filter((F.col("dd") != 0) | (F.col("dw") != 0.0))
    return base.select(F.col("u").alias("node"), "dd", "dw").unionByName(
        base.select(F.col("v").alias("node"), "dd", "dw")
    )


def _update_node(key, pdf_iter, state: GroupState):
    deg, wdeg, upd = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdf_iter:
        deg += int(pdf["dd"].sum())
        wdeg += float(pdf["dw"].sum())
        upd += len(pdf)
    state.update((deg, wdeg, upd))
    # ``updates`` is a per-node monotone version: sinks that see multiple
    # emissions keep the row with the highest updates count
    yield pd.DataFrame(
        {"node": [key[0]], "degree": [deg], "wdeg": [wdeg], "updates": [upd]}
    )


def streaming_degree_tracker(event_stream: DataFrame) -> DataFrame:
    """Stateful streaming (node, degree, wdeg) over a readStream of
    EVENT_SCHEMA rows. Returns the update-mode streaming DataFrame; attach
    your sink with ``.writeStream.outputMode("update")``."""
    deltas = _event_deltas(event_stream)
    return deltas.groupBy("node").applyInPandasWithState(
        _update_node,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
