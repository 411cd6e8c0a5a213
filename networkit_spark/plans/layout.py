"""Physical layout: salted, hash-partitioned CSR-like adjacency blocks.

The north-star physical plan (BASELINE.json): edges are stored src-bucketed
as array-typed block rows so a PageRank/Katz superstep is a partition-local
NumPy SpMV inside ``applyInPandas`` plus one shuffle-reduce, with explicit
skew handling:

- bucket = xxhash64(src, salt) % P — the adjacency NEVER re-shuffles across
  supersteps; only the (node, score) vector is routed to buckets.
- high-degree vertices (degree > salt_threshold) are SPLIT: their adjacency
  is spread over ``salts`` sub-rows landing in different buckets, each
  holding a slice of the out-edges; partial contributions re-sum in the
  global reduce. This bounds any single block row / task by the salt factor
  — the distributed analog of the reference's ``balancedParallelForNodes``
  guided scheduling (Graph.h:984) and the CSR hot-loop materialization
  (CSRMatrix.h:26-35, TriangleEdgeScore.cpp:30-47).
- the in-UDF partial aggregation (np.bincount over local dst) is map-side
  combine done in NumPy: shuffle volume is #distinct dst per block, not
  #edges.

Block schema: (bucket INT, srcs ARRAY<BIGINT>, offsets ARRAY<INT>,
dsts ARRAY<BIGINT>, ps ARRAY<DOUBLE>) — offsets[i]..offsets[i+1] indexes the
dst/p slices of srcs[i], i.e. a per-bucket CSR.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..graph import Graph

BLOCK_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("srcs", ArrayType(LongType())),
        StructField("offsets", ArrayType(IntegerType())),
        StructField("dsts", ArrayType(LongType())),
        StructField("ps", ArrayType(DoubleType())),
    ]
)

CONTRIB_SCHEMA = StructType(
    [StructField("dst", LongType()), StructField("mass", DoubleType())]
)


def build_csr_blocks(
    graph: Graph,
    num_buckets: int = 64,
    salt_threshold: int = 100_000,
    salts: int = 16,
    value_col: str = "p",
    edges_with_values: Optional[DataFrame] = None,
    max_block_edges: int = 4_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Returns (blocks, need) where ``need`` = distinct (src, bucket) routing
    table for the rank vector. ``edges_with_values`` defaults to the PageRank
    transition (src, dst, p = w/wdeg).

    A bucket's edges are emitted as MULTIPLE block rows of at most
    ``max_block_edges`` edges each (chunked positionally after the CSR
    sort — a src spanning a chunk boundary simply appears in both rows;
    the downstream reduce-by-dst makes that sound). Without the cap a
    bucket materializes as ONE pandas group / ONE array row, so at 10B+
    edges a single Python worker holds ~m/num_buckets edges in memory and
    the int32 offsets overflow at 2^31 — the salting bounds per-NODE skew,
    not per-bucket TOTAL."""
    if edges_with_values is None:
        out = graph.sym()
        wdeg = out.groupBy("src").agg(F.sum("weight").alias("wdeg"))
        edges_with_values = out.join(wdeg, "src").select(
            "src", "dst", (F.col("weight") / F.col("wdeg")).alias(value_col)
        )
    deg = edges_with_values.groupBy("src").agg(F.count("*").alias("d"))
    e = edges_with_values.join(deg, "src")
    # salt only the heavy hitters: normal vertices keep salt 0 (single home
    # bucket → rank routed once); hubs spread over `salts` buckets
    salt = F.when(
        F.col("d") > salt_threshold, F.pmod(F.xxhash64("dst"), F.lit(salts))
    ).otherwise(F.lit(0))
    e = e.select(
        "src", "dst", value_col, F.pmod(F.xxhash64("src", salt), F.lit(num_buckets)).cast("int").alias("bucket")
    )

    def to_csr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        bucket = int(pdf["bucket"].iloc[0])
        srcs_all = pdf["src"].to_numpy()
        dsts_all = pdf["dst"].to_numpy()
        ps_all = pdf[value_col].to_numpy()
        out = {"bucket": [], "srcs": [], "offsets": [], "dsts": [], "ps": []}
        for lo in range(0, len(srcs_all), max_block_edges):
            hi = min(lo + max_block_edges, len(srcs_all))
            srcs_arr = srcs_all[lo:hi]
            uniq, starts = np.unique(srcs_arr, return_index=True)
            offsets = np.append(starts, len(srcs_arr)).astype("int32")
            out["bucket"].append(bucket)
            out["srcs"].append(uniq.tolist())
            out["offsets"].append(offsets.tolist())
            out["dsts"].append(dsts_all[lo:hi].tolist())
            out["ps"].append(ps_all[lo:hi].tolist())
        return pd.DataFrame(out)

    blocks = e.groupBy("bucket").applyInPandas(to_csr, BLOCK_SCHEMA)
    need = e.select("src", "bucket").distinct()
    return blocks, need


# semiring name -> (numpy ⊗, numpy ⊕ ufunc for the in-UDF reduceat combine)
_NP_SEMIRING = {
    "arithmetic": (np.multiply, np.add),
    "min_plus": (np.add, np.minimum),
    "max_plus": (np.add, np.maximum),
    "min_max": (np.maximum, np.minimum),
    "max_min": (np.minimum, np.maximum),
    "logical": (np.minimum, np.maximum),
}


def spmv_superstep(
    blocks: DataFrame, need: DataFrame, ranks: DataFrame, semiring=None
) -> DataFrame:
    """One gather-scatter: route scores to buckets, block-local NumPy
    multiply with in-UDF combine, global reduce by dst. Returns
    (dst, mass) = ⊕_{src→dst} p ⊗ score[src] — (+,×) by default; any
    :mod:`..operators.semirings` semiring generalizes it (reference
    GraphBLAS.h:197-238 MxV; Semirings.h:25-170), which subsumes BFS/SSSP
    as algebraic supersteps over the same salted CSR blocks."""
    from ..operators.semirings import ARITHMETIC

    sr = semiring or ARITHMETIC
    np_mult, np_red = _NP_SEMIRING[sr.name]
    zero = sr.zero
    routed = (
        ranks.join(need, ranks.node == need.src)
        .select("bucket", "src", "score")
    )

    def multiply(key, block_pdf: pd.DataFrame, scores_pdf: pd.DataFrame) -> pd.DataFrame:
        if block_pdf.empty or scores_pdf.empty:
            return pd.DataFrame({"dst": [], "mass": []}).astype(
                {"dst": "int64", "mass": "float64"}
            )
        out_frames = []
        smap = pd.Series(
            scores_pdf["score"].to_numpy(), index=scores_pdf["src"].to_numpy()
        )
        for _, row in block_pdf.iterrows():
            srcs = np.asarray(row["srcs"], dtype=np.int64)
            offsets = np.asarray(row["offsets"], dtype=np.int64)
            dsts = np.asarray(row["dsts"], dtype=np.int64)
            ps = np.asarray(row["ps"], dtype=np.float64)
            # absent vector entries read as the semiring zero (sparse input)
            sc = smap.reindex(srcs).fillna(zero).to_numpy()
            # expand per-src score across its CSR slice
            reps = np.diff(offsets)
            edge_scores = np.repeat(sc, reps)
            contrib = np_mult(ps, edge_scores)
            # in-UDF partial aggregation (map-side combine in NumPy)
            if np_red is np.add:
                u, inv = np.unique(dsts, return_inverse=True)
                mass = np.bincount(inv, weights=contrib)
            else:
                order = np.argsort(dsts, kind="mergesort")
                d_sorted, c_sorted = dsts[order], contrib[order]
                u, starts = np.unique(d_sorted, return_index=True)
                mass = np_red.reduceat(c_sorted, starts)
            out_frames.append(pd.DataFrame({"dst": u, "mass": mass}))
        return pd.concat(out_frames, ignore_index=True)

    contribs = (
        blocks.groupBy("bucket")
        .cogroup(routed.groupBy("bucket"))
        .applyInPandas(multiply, CONTRIB_SCHEMA)
    )
    out = contribs.groupBy("dst").agg(sr.add_agg(F.col("mass")).alias("mass"))
    if zero in (float("inf"), float("-inf")):
        out = out.filter(F.col("mass") != F.lit(zero))
    return out


def pagerank_csr(
    graph: Graph,
    damp: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
    fixed_iters: Optional[int] = None,
    num_buckets: int = 64,
    salt_threshold: int = 100_000,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """PageRank over CSR blocks — identical semantics/results to
    operators.pagerank.pagerank (reference PageRank.cpp:20-71), different
    physical plan. Equivalence is asserted in tests at 1e-12."""
    import math

    from .iterate import SuperstepDriver

    n = graph.num_nodes()
    nodes = graph.nodes().persist()
    blocks, need = build_csr_blocks(
        graph, num_buckets=num_buckets, salt_threshold=salt_threshold
    )
    blocks = blocks.persist()
    need = need.persist()
    blocks.count()
    need.count()

    teleport = (1.0 - damp) / n
    init = nodes.select("node", F.lit(1.0 / n).alias("score"))

    def step(ranks: DataFrame, i: int):
        sums = spmv_superstep(blocks, need, ranks)
        new = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            (F.lit(damp) * F.coalesce("mass", F.lit(0.0)) + F.lit(teleport)).alias("score"),
        )
        # step owns the truncation (driver runs use_local_checkpoint=False):
        # the adaptive residual below reads the cached frame instead of
        # computing the plan once for the collect and AGAIN for the driver's
        # re-checkpoint
        new = new.localCheckpoint(eager=True)
        if fixed_iters is not None:
            return new, None
        resid = (
            new.alias("a")
            .join(ranks.alias("b"), "node")
            .agg(F.sum(F.pow(F.col("a.score") - F.col("b.score"), 2)).alias("s"))
            .collect()[0]["s"]
        )
        return new, math.sqrt(resid or 0.0)

    driver = SuperstepDriver(
        tol=tol,
        max_iter=fixed_iters if fixed_iters is not None else max_iter,
        checkpoint_dir=checkpoint_dir,
        use_local_checkpoint=False,
    )
    state = driver.run(init, step)
    blocks.unpersist()
    need.unpersist()
    nodes.unpersist()
    total = state.df.agg(F.sum("score").alias("t")).collect()[0]["t"]
    out = state.df.select("node", (F.col("score") / F.lit(total)).alias("score"))
    out._iterations = state.iteration
    return out
