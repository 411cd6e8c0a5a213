"""Selective community detection: greedy community expansion (GCE).

Reference: cpp/scd/GCE.cpp:27-195 (expandSeed). Objective "M" (:115-120):
for a community C with ``intEdges`` internal and ``extEdges`` external edges,
moving shell node v (with ``degInt``/``degExt`` edges into/out of C) is worth

    dQ = (intEdges + degInt) / (extEdges - degInt + degExt) - M(C)

with ``M(C) = intEdges / extEdges``. Each round scans the shell
(= N(C) \\ C — GCE.cpp maintains this incrementally at :41-44,182-189, which
is equivalent because C only grows), takes the best ``dQ >= 0`` move
(GCE.cpp:173-177: the scan accepts ``dQ >= dQMax`` with ``dQMax`` starting at
0.0 and iterates an ascending ``std::set``, so ties resolve to the HIGHEST
node id), and stops when no move qualifies.

Spark-first shape: the reference expands one seed at a time, one node per
scan (:160-192). Here ALL seeds expand together in one (seed, node) state
DataFrame — each greedy round is three joins + two aggregations over the
union of all shells, so k seeds cost one expansion's worth of supersteps.
Seeds whose expansion stalls drop out of the active set. The per-round
argmax is ``max(struct(...))`` per seed — a map-side-combinable aggregation,
no windows.

Deviations from the reference (documented, deliberate):
- ``max_steps`` bounds the number of additions per seed. The reference runs
  to the local optimum, which on graphs without conductance structure can
  absorb an entire component; a fixed bound keeps the operator's cost
  predictable and makes the computation exactly reproducible by an unrolled
  SQL oracle. Pass ``max_steps=None`` to run to the local optimum.
- Only objective "M" is implemented. Objective "L" (GCE.cpp:127-133)
  re-derives the boundary size for every candidate move — O(shell × degree)
  work per scan with no incremental form; nothing in the reference's test
  suite exercises it.
- A move that absorbs the last external edge (denominator 0; the reference
  computes ``x / 0.0`` = +inf and always takes it) is handled explicitly via
  an absorb flag ranked above every finite dQ.

The graph is treated as unweighted (the reference counts neighbors,
GCE.cpp:84-92), multi-edges collapse via the canonical edge set.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc


def gce_expand(
    graph: Graph,
    seeds: Sequence[int],
    max_steps: Optional[int] = 32,
    objective: str = "M",
) -> DataFrame:
    """Expand each seed into a community, all seeds batched. Returns
    ``(seed, node)`` membership rows (the seed itself included).
    """
    if objective != "M":
        raise NotImplementedError("only objective 'M' (GCE.cpp:115-120)")
    spark = graph.edges.sparkSession
    sym = graph.sym().select("src", "dst").distinct().persist()
    sym.count()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))

    comm = spark.createDataFrame(
        [(int(s), int(s)) for s in seeds], "seed long, node long"
    ).transform(_cc)
    active = comm.select("seed").distinct()

    step = 0
    while max_steps is None or step < max_steps:
        step += 1
        cur = comm.join(active, "seed")
        # degInt(seed, v) for every v adjacent to C (members included)
        dint = (
            sym.join(cur, sym.dst == cur.node)
            .groupBy("seed", F.col("src").alias("v"))
            .agg(F.count("*").alias("deg_int"))
        )
        # intEdges = sum of members' deg_int / 2; extEdges = sum deg - 2*int
        stats = (
            cur.join(deg, "node")
            .join(
                dint.withColumnRenamed("v", "node"),
                ["seed", "node"],
                "left",
            )
            .groupBy("seed")
            .agg(
                (F.sum(F.coalesce("deg_int", F.lit(0))) / 2).alias("int_edges"),
                (
                    F.sum("deg") - F.sum(F.coalesce("deg_int", F.lit(0)))
                ).alias("ext_edges"),
            )
        )
        shell = (
            dint.join(
                cur.withColumnRenamed("node", "v"), ["seed", "v"], "left_anti"
            )
            .join(deg.withColumnRenamed("node", "v"), "v")
            .join(stats, "seed")
        )
        denom = F.col("ext_edges") - F.col("deg_int") + (
            F.col("deg") - F.col("deg_int")
        )
        dq = (
            (F.col("int_edges") + F.col("deg_int")) / denom
            - F.col("int_edges") / F.col("ext_edges")
        )
        best = (
            shell.select(
                "seed",
                "v",
                (denom == 0).alias("absorb"),
                F.when(denom > 0, dq).otherwise(F.lit(0.0)).alias("dq"),
            )
            .filter(F.col("absorb") | (F.col("dq") >= 0))
            .groupBy("seed")
            .agg(F.max(F.struct("absorb", "dq", "v")).alias("b"))
            .select("seed", F.col("b.v").alias("node"))
            .transform(_cc)
        )
        if best.count() == 0:
            break
        comm = comm.unionByName(best).transform(_cc)
        active = best.select("seed")
    sym.unpersist()
    return comm
