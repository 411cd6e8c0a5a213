"""Stats-clean local checkpointing for iterative loops.

``Dataset.localCheckpoint`` truncates lineage but PROPAGATES the optimized
plan's statistics onto the resulting ``LogicalRDD`` (``originStats``). In a
loop whose state frames join each other (or frames derived from themselves)
every round — push-relabel's ``arcs ⋈ state``, path-growing's
``edges ⋈ dead(edges)``, PLM's labels entering its sweep's join tree ~4
times, pointer jumping's label-of-label self-join — join estimation
MULTIPLIES the propagated ``sizeInBytes`` values, so the statistic's BIT
LENGTH grows by the state's multiplicity in its own update tree every round
(63 → 137 → 273 → … measured at ×2; PLM measured ×4 → an sf0.1 move phase
hung for 20+ minutes inside Toom-Cook BigInteger products before this fix).
Catalyst planning then spends minutes per query multiplying million-bit
BigIntegers on the driver's planning thread and eventually OOMs building
them. Loops that only join checkpoints against ``persist()``-ed inputs
compound additively (one fixed multiplier per round — linear bit growth,
harmless for hundreds of rounds; InMemoryRelation reports its real cached
size), which is why PageRank's ``rank ⋈ transition`` superstep stays on the
plain checkpoint while every state-self-joining loop (components, SCC trim,
PLM, PLP, k-core peel, Luby, Borůvka/UMSF, coloring, GCE, BFS/SSSP
frontiers, Brandes levels, dynamic SSSP cones, SEIR, dedup hash-to-min)
routes through :func:`clean_local_checkpoint`.

:func:`clean_local_checkpoint` checkpoints eagerly, then rebuilds the
Dataset from the checkpointed ``RDD[InternalRow]`` via
``SparkSession.internalCreateDataFrame`` — a ``LogicalRDD`` WITHOUT
``originStats``, i.e. ``sizeInBytes = spark.sql.defaultSizeInBytes``
(constant per round, never compounds). Consequence: these frames are never
auto-broadcast — loop bodies must ``F.broadcast()`` explicitly where they
want it (they already do).

The reference implementation needs none of this — its loops are in-process
arrays; this is purely a property of re-expressing them as Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def clean_local_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint with plan statistics dropped (see module doc).

    Falls back to the plain checkpoint when the classic-session internal
    API is unavailable (e.g. Spark Connect).
    """
    ck = df.localCheckpoint(eager=True)
    try:
        spark = ck.sparkSession
        jqe = ck._jdf.queryExecution()
        jds = spark._jsparkSession.internalCreateDataFrame(
            jqe.toRdd(), jqe.analyzed().schema(), False
        )
        return DataFrame(jds, spark)
    except Exception:
        return ck
