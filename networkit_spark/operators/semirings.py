"""GraphBLAS-style semiring surface over DataFrame-encoded sparse matrices.

Reference: /root/reference/networkit/cpp/algebraic/Semirings.h:25-170 (the
six semirings: Arithmetic, MinPlus, MaxPlus, MinMax, MaxMin, IntLogical) and
GraphBLAS.h:101-238 (MxM, MxV, eWiseBinOp over matrices with a semiring
zero).  The reference materializes rows through a SparseAccumulator; here a
sparse matrix IS a DataFrame of ``(row, col, value)`` triplets (zero =
absent row, exactly the reference's "zero elements are not stored"
convention, AlgebraicGlobals.h), a vector is ``(node, value)``, and every
operation is a declarative join + aggregate that Catalyst plans JVM-side:

- ``mxv``:   join on the inner dimension, ``mult`` the pairs, ``add``-reduce
             per output row — one shuffle on the matrix's col key.
- ``mxm``:   the same join keyed (row, col) — shuffle on the inner dim, then
             one grouped reduce.
- ``ewise``: full outer join on (row, col) with the semiring zero filling
             the misses.

Because add must be a *commutative monoid*, every reduce is expressible as a
built-in Spark aggregate (sum / min / max / bool_or) — no UDFs, whole-stage
codegen end to end.  ``bfs_algebraic`` / ``sssp_algebraic`` demonstrate the
subsumption the GraphBLAS interface promises: BFS is the MinPlus fixpoint
over the unit-weight adjacency, Bellman-Ford the same over weights —
identical results to operators/distance.py's frontier implementations.

At 100 TB the shapes hold: mxv shuffles only the O(nnz) multiplied pairs
with map-side partial aggregation (all add monoids combine partially), and
the adjacency side can be pre-partitioned by ``col`` once and reused across
supersteps like the PageRank transition.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc

INF = float("inf")


@dataclass(frozen=True)
class Semiring:
    """(add monoid, mult, zero, one) — add/mult as Column expressions plus
    the matching distributed aggregate for add (Semirings.h:25-170)."""

    name: str
    add: Callable[[Column, Column], Column]
    add_agg: Callable[[Column], Column]
    mult: Callable[[Column, Column], Column]
    zero: float
    one: float


ARITHMETIC = Semiring(
    "arithmetic", lambda a, b: a + b, F.sum, lambda a, b: a * b, 0.0, 1.0
)
MIN_PLUS = Semiring(
    "min_plus", F.least, F.min, lambda a, b: a + b, INF, 0.0
)
MAX_PLUS = Semiring(
    "max_plus", F.greatest, F.max, lambda a, b: a + b, -INF, 0.0
)
MIN_MAX = Semiring(
    "min_max", F.least, F.min, F.greatest, INF, -INF
)
# one = +INF, the true multiplicative identity (min(+inf, x) = x). The
# reference's Semirings.h MaxMin returns 0 here even though its own doc
# comment says +infty — a reference bug we do NOT mirror: with one=0 a
# seeded bottleneck/widest-path MxV clamps every product to 0.
MAX_MIN = Semiring(
    "max_min", F.greatest, F.max, F.least, -INF, INF
)
# IntLogical (or, and, 0, 1) on 0/1-valued doubles (Semirings.h:155-170)
LOGICAL = Semiring(
    "logical",
    lambda a, b: F.greatest(a, b),
    F.max,
    lambda a, b: F.least(a, b),
    0.0,
    1.0,
)

SEMIRINGS = {
    s.name: s for s in (ARITHMETIC, MIN_PLUS, MAX_PLUS, MIN_MAX, MAX_MIN, LOGICAL)
}


def adjacency_matrix(graph: Graph, one_weights: bool = False) -> DataFrame:
    """(row, col, value) triplets of the (symmetrized if undirected)
    adjacency — the reference's Matrix(graph) constructor analog."""
    e = graph.sym()
    v = F.lit(1.0) if one_weights else F.col("weight").cast("double")
    return e.select(F.col("src").alias("row"), F.col("dst").alias("col"), v.alias("value"))


def mxv(A: DataFrame, v: DataFrame, semiring: Semiring = ARITHMETIC) -> DataFrame:
    """GraphBLAS.MxV (GraphBLAS.h:197-219): c[i] = ⊕_j A[i,j] ⊗ v[j] over
    stored elements. Sparse in, sparse out: rows whose reduce is empty are
    absent (= semiring zero)."""
    vv = v.select(F.col("node").alias("col"), F.col("value").alias("vval"))
    prod = A.join(vv, "col").select(
        F.col("row").alias("node"),
        semiring.mult(F.col("value"), F.col("vval")).alias("p"),
    )
    return prod.groupBy("node").agg(semiring.add_agg(F.col("p")).alias("value"))


def mxm(A: DataFrame, B: DataFrame, semiring: Semiring = ARITHMETIC) -> DataFrame:
    """GraphBLAS.MxM (GraphBLAS.h:101-133): C[i,k] = ⊕_j A[i,j] ⊗ B[j,k]."""
    a = A.select(F.col("row"), F.col("col").alias("j"), F.col("value").alias("av"))
    b = B.select(F.col("row").alias("j"), F.col("col"), F.col("value").alias("bv"))
    prod = a.join(b, "j").select(
        "row", "col", semiring.mult(F.col("av"), F.col("bv")).alias("p")
    )
    return prod.groupBy("row", "col").agg(semiring.add_agg(F.col("p")).alias("value"))


def ewise(
    A: DataFrame,
    B: DataFrame,
    op: Callable[[Column, Column], Column],
    semiring: Semiring = ARITHMETIC,
) -> DataFrame:
    """GraphBLAS.eWiseBinOp (GraphBLAS.h:36-95): op over the union of stored
    positions, absent entries read as the semiring zero; results equal to
    the zero are dropped (not stored), matching the reference's
    ``value != SemiRing::zero()`` filter."""
    a = A.select("row", "col", F.col("value").alias("av"))
    b = B.select("row", "col", F.col("value").alias("bv"))
    z = F.lit(semiring.zero)
    out = (
        a.join(b, ["row", "col"], "full_outer")
        .select(
            "row",
            "col",
            op(F.coalesce("av", z), F.coalesce("bv", z)).alias("value"),
        )
    )
    return out.filter(F.col("value") != F.lit(semiring.zero))


def vector(graph_or_df, pairs=None) -> DataFrame:
    """Build a sparse (node, value) vector from python pairs
    (``None`` = the empty vector)."""
    spark = (
        graph_or_df.edges.sparkSession
        if isinstance(graph_or_df, Graph)
        else graph_or_df.sparkSession
    )
    return spark.createDataFrame(
        [(int(k), float(x)) for k, x in pairs or ()], "node long, value double"
    )


def _fixpoint_distances(
    graph: Graph, source: int, one_weights: bool, max_iter: int
) -> DataFrame:
    """MinPlus fixpoint d = min(d, A^T ⊗ d) from the source's unit vector —
    Bellman-Ford as repeated semiring MxV (the GraphBLAS-subsumes-BFS/SSSP
    claim of GraphBLAS.h's interface docs). The adjacency is symmetric here
    so A^T = A; the matrix is persisted once and reused per superstep."""
    A = adjacency_matrix(graph, one_weights=one_weights).persist()
    A.count()
    d = vector(graph, [(source, MIN_PLUS.one)]).transform(_cc)
    for _ in range(max_iter):
        relaxed = mxv(A, d, MIN_PLUS)
        new = (
            d.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("value").alias("value"))
            .transform(_cc)
        )
        changed = (
            new.join(d.withColumnRenamed("value", "old"), "node", "left")
            .filter(F.col("old").isNull() | (F.col("value") < F.col("old")))
            .isEmpty()
        )
        d = new
        if changed:
            break
    A.unpersist()
    return d


def bfs_algebraic(graph: Graph, source: int, max_iter: int = 10_000) -> DataFrame:
    """BFS hop distances as the MinPlus fixpoint over unit weights; equals
    operators/distance.bfs_distances on reachable nodes."""
    return _fixpoint_distances(graph, source, True, max_iter).select(
        "node", F.col("value").cast("long").alias("dist")
    )


def sssp_algebraic(graph: Graph, source: int, max_iter: int = 10_000) -> DataFrame:
    """Weighted SSSP (Bellman-Ford) as the MinPlus fixpoint; equals
    operators/distance.sssp_distances on reachable nodes."""
    return _fixpoint_distances(graph, source, False, max_iter).select(
        "node", F.col("value").alias("dist")
    )


def reachability(graph: Graph, source: int, max_iter: int = 10_000) -> DataFrame:
    """Reachable set via the IntLogical semiring (or, and): r = r ∨ (A ∧ r)
    to fixpoint — returns (node,) rows."""
    A = adjacency_matrix(graph, one_weights=True).persist()
    A.count()
    r = vector(graph, [(source, LOGICAL.one)]).transform(_cc)
    for _ in range(max_iter):
        hop = mxv(A, r, LOGICAL)
        new = (
            r.unionByName(hop)
            .groupBy("node")
            .agg(F.max("value").alias("value"))
            .transform(_cc)
        )
        if new.count() == r.count():
            break
        r = new
    A.unpersist()
    return r.filter(F.col("value") >= LOGICAL.one).select("node")
