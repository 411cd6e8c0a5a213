"""Distributed graph coloring — Jones–Plassmann with seeded-hash priorities.

Reference: /root/reference/networkit/coloring.py (SpectralColoring) — the
reference colors via driver-side adjacency eigenvectors, which neither
distributes nor bounds the palette. The Spark-first replacement is the
classic Jones–Plassmann independent-set schedule: give every node a
deterministic hash priority; each superstep, every uncolored node that is a
local priority maximum among its UNCOLORED neighbors takes the smallest
color unused by its already-colored neighbors. Deterministic (seeded md5
priorities, total order via (priority, node)), proper by construction, and
uses at most Δ+1 colors.

Scale notes: each superstep is one edges⋈state join + two aggregations; the
round count equals the longest monotone-priority path, O(log n / log log n)
expected on bounded-degree graphs but potentially large on dense graphs —
for web graphs color the k-core-peeled remainder or cap rounds and finish
hubs with a conflict-resolution sweep (documented limitation; the test
fixture keeps rounds small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.dedup import hash60
from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc


def jones_plassmann_coloring(
    graph: Graph, seed: int = 42, max_rounds: int = 10_000
) -> DataFrame:
    """Returns (node, color) — a proper coloring, deterministic in ``seed``.

    Priority p(v) = (hash60(v:seed), v); a node colors itself once no
    uncolored neighbor has higher priority, choosing the smallest
    non-negative color absent from its colored neighborhood.
    """
    sym = graph.sym_part(key="dst").persist()
    sym.count()
    pri = F.struct(
        hash60(F.concat_ws(":", F.col("node").cast("string"), F.lit(str(seed)))).alias("h"),
        F.col("node").alias("n"),
    )
    # state: (node, pri, color) with color = null while uncolored
    state = (
        graph.nodes()
        .select("node", pri.alias("pri"), F.lit(None).cast("int").alias("color"))
        .transform(_cc)
    )
    for _ in range(max_rounds):
        uncolored = state.filter(F.col("color").isNull())
        if uncolored.isEmpty():
            break
        nbr = sym.join(
            state.select(
                F.col("node").alias("dst"),
                F.col("pri").alias("npri"),
                F.col("color").alias("ncolor"),
            ),
            "dst",
        ).select(F.col("src").alias("node"), "npri", "ncolor")
        per_node = nbr.groupBy("node").agg(
            F.max(F.when(F.col("ncolor").isNull(), F.col("npri"))).alias("max_unc_pri"),
            F.array_sort(
                F.array_distinct(
                    F.collect_list(F.when(F.col("ncolor").isNotNull(), F.col("ncolor")))
                )
            ).alias("used"),
        )
        # smallest color not in `used`: first gap in the sorted distinct list
        smallest = F.coalesce(
            F.filter(
                F.sequence(F.lit(0), F.size("used")),
                lambda c: ~F.array_contains("used", c),
            )[0],
            F.lit(0),
        )
        state = (
            state.join(per_node, "node", "left")
            .select(
                "node",
                "pri",
                F.when(F.col("color").isNotNull(), F.col("color"))
                .when(
                    F.col("max_unc_pri").isNull()
                    | (F.col("max_unc_pri") < F.col("pri")),
                    smallest,
                )
                .alias("color"),
            )
            .transform(_cc)
        )
    sym.unpersist()
    return state.select("node", F.col("color").cast("int").alias("color"))
