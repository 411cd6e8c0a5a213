"""Epidemic simulation (SEIR) over the graph — reference
cpp/simulation/EpidemicSimulationSEIR.cpp:16-103.

Per step t: infectious nodes contact every neighbor; a susceptible contact
becomes Exposed with probability ``trans_p``; Exposed becomes Infectious
after ``e_time`` steps; Infectious becomes Removed after ``i_time`` steps;
after the sweep a census row (t, state, count) is recorded per state.

Determinism: the reference draws ``Aux::Random::probability()`` per contact
inside a racy parallel sweep — the outcome depends on thread interleaving.
The distributed version replaces that with ONE seeded-hash draw per
(node, step): ``unit_hash(node, t, seed) <= trans_p`` decides exposure of a
susceptible node that has >= 1 infectious neighbor this step. (Documented
deviation: the reference draws per CONTACT, so k infectious neighbors give
exposure probability 1-(1-p)^k; the per-node draw gives p independent of k.
The reference's outcome is thread-interleaving-dependent either way, so the
reproducible single-draw law is the deliberate choice.) Bit-reproducible on
any partitioning, exactly replicated by the DuckDB oracle (gate ``seir``).

Synchronous-step semantics (all transitions evaluated on the start-of-step
state) match the reference's single-pass sweep: a node promoted E→I this
step does not contact until the next step (the I branch is not re-entered),
and contacts come from nodes infectious at the start of the step.

Every step is two joins + a census aggregate on the (node, state, ts)
DataFrame — frontier-sized work, the same shape as bfs_distances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc
from ..functions.dedup import hash60

_HSPACE = float(2 ** 60)

S, E, I, R = "S", "E", "I", "R"
_STATE_IDX = {S: 0, E: 1, I: 2, R: 3}


def seir_simulation(
    graph: Graph,
    t_max: int,
    trans_p: float,
    e_time: int,
    i_time: int,
    zero: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Returns the census (zero, t, state_idx, population) — one row per
    (step, state), the exact shape of the reference's getData()."""
    sym = graph.sym().select("src", "dst").persist()
    sym.count()
    nodes = graph.nodes()
    state = nodes.select(
        "node",
        F.when(F.col("node") == zero, F.lit(I)).otherwise(F.lit(S)).alias("state"),
        F.lit(0).alias("ts"),
    ).transform(_cc)

    census_rows = []
    for t in range(t_max):
        infectious = state.filter(F.col("state") == I).select(
            F.col("node").alias("src")
        )
        contacted = (
            sym.join(F.broadcast(infectious), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        draw = (
            hash60(
                F.concat_ws(
                    ":", F.col("node").cast("string"), F.lit(t), F.lit(str(seed))
                )
            )
            / F.lit(_HSPACE)
        )
        exposed_now = F.col("state").eqNullSafe(S) & F.col("hit").isNotNull() & (
            draw <= F.lit(trans_p)
        )
        nxt = (
            state.join(
                contacted.withColumn("hit", F.lit(1)), "node", "left"
            )
            .select(
                "node",
                F.when(exposed_now, F.lit(E))
                .when(
                    (F.col("state") == E) & (F.lit(t) - F.col("ts") >= e_time),
                    F.lit(I),
                )
                .when(
                    (F.col("state") == I) & (F.lit(t) - F.col("ts") >= i_time),
                    F.lit(R),
                )
                .otherwise(F.col("state"))
                .alias("state2"),
                F.col("state").alias("old"),
                "ts",
            )
            .select(
                "node",
                F.col("state2").alias("state"),
                F.when(F.col("state2") != F.col("old"), F.lit(t))
                .otherwise(F.col("ts"))
                .alias("ts"),
            )
            .transform(_cc)
        )
        state = nxt
        counts = {
            r["state"]: r["n"]
            for r in state.groupBy("state").agg(F.count("*").alias("n")).collect()
        }
        for s_name, s_idx in _STATE_IDX.items():
            census_rows.append((zero, t, s_idx, counts.get(s_name, 0)))

    sym.unpersist()
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        census_rows, "zero long, t int, state int, population long"
    )
