"""GraphBLAS-style semiring surface (reference cpp/algebraic/Semirings.h:25-170,
GraphBLAS.h:101-238): mxv/mxm/ewise vs dense NumPy replicas under every
semiring, and the BFS/SSSP-subsumption fixpoints vs operators/distance.py."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.semirings import (
    ARITHMETIC,
    LOGICAL,
    MAX_MIN,
    MAX_PLUS,
    MIN_MAX,
    MIN_PLUS,
    SEMIRINGS,
    adjacency_matrix,
    bfs_algebraic,
    ewise,
    mxm,
    mxv,
    reachability,
    sssp_algebraic,
    vector,
)

NP_OPS = {
    "arithmetic": (np.multiply, np.add, 0.0),
    "min_plus": (np.add, np.minimum, math.inf),
    "max_plus": (np.add, np.maximum, -math.inf),
    "min_max": (np.maximum, np.minimum, math.inf),
    "max_min": (np.minimum, np.maximum, -math.inf),
    "logical": (np.minimum, np.maximum, 0.0),
}

# a fixed 5x5 sparse matrix and vector (logical wants 0/1 values, the
# generic ones get small positive reals — both valid for every semiring)
TRIPLETS = [(0, 1, 2.0), (0, 3, 1.0), (1, 2, 4.0), (2, 0, 3.0), (2, 4, 1.0),
            (3, 4, 5.0), (4, 1, 1.0)]
VEC = [(0, 1.0), (1, 2.0), (3, 1.0)]
N = 5


def _dense(trips, n, zero):
    A = np.full((n, n), zero)
    for i, j, v in trips:
        A[i, j] = v
    return A


def _dense_vec(pairs, n, zero):
    x = np.full(n, zero)
    for i, v in pairs:
        x[i] = v
    return x


@pytest.fixture()
def A(spark):
    return spark.createDataFrame(TRIPLETS, "row long, col long, value double")


@pytest.mark.parametrize("name", sorted(SEMIRINGS))
def test_mxv_matches_dense(spark, A, name):
    sr = SEMIRINGS[name]
    mult, red, zero = NP_OPS[name]
    got = {r["node"]: r["value"] for r in mxv(A, vector(A, VEC), sr).collect()}
    Ad = _dense(TRIPLETS, N, zero)
    xd = _dense_vec(VEC, N, zero)
    # reduce only over STORED (i,j)/vector positions, like the sparse op
    want = {}
    stored_cols = {i: [j for (r, j, _) in TRIPLETS if r == i] for i in range(N)}
    vec_pos = {i for i, _ in VEC}
    for i in range(N):
        vals = [mult(Ad[i, j], xd[j]) for j in stored_cols[i] if j in vec_pos]
        if vals:
            want[i] = float(red.reduce(np.array(vals)))
    assert got == pytest.approx(want)


@pytest.mark.parametrize("name", ["arithmetic", "min_plus", "max_min"])
def test_mxm_matches_dense(spark, A, name):
    sr = SEMIRINGS[name]
    mult, red, zero = NP_OPS[name]
    got = {(r["row"], r["col"]): r["value"] for r in mxm(A, A, sr).collect()}
    want = {}
    for i, j, av in TRIPLETS:
        for j2, k, bv in TRIPLETS:
            if j2 != j:
                continue
            p = float(mult(av, bv))
            want[(i, k)] = float(red(want[(i, k)], p)) if (i, k) in want else p
    assert got == pytest.approx(want)


def test_ewise_union_semantics(spark, A):
    B = spark.createDataFrame(
        [(0, 1, 10.0), (4, 4, 7.0)], "row long, col long, value double"
    )
    got = {(r["row"], r["col"]): r["value"]
           for r in ewise(A, B, lambda a, b: a + b, ARITHMETIC).collect()}
    assert got[(0, 1)] == 12.0          # both stored
    assert got[(4, 4)] == 7.0           # only B stored, A reads zero
    assert got[(1, 2)] == 4.0           # only A stored
    # a result equal to the semiring zero is dropped (not stored)
    C = spark.createDataFrame([(0, 1, -2.0)], "row long, col long, value double")
    diff = ewise(A, C, lambda a, b: a + b, ARITHMETIC)
    assert (0, 1) not in {(r["row"], r["col"]) for r in diff.collect()}


@pytest.fixture()
def path_graph(spark):
    # weighted path 0-1-2-3-4 plus a shortcut 0-3
    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 4, 3.0), (0, 3, 10.0)]
    return Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )


def test_sssp_algebraic_matches_frontier(spark, path_graph):
    from networkit_spark.operators.distance import sssp_distances

    got = {r["node"]: r["dist"] for r in sssp_algebraic(path_graph, 0).collect()}
    want = {
        r["node"]: r["dist"]
        for r in sssp_distances(path_graph, 0).collect()
        if r["dist"] is not None and not math.isinf(r["dist"])
    }
    assert got == pytest.approx(want)


def test_bfs_algebraic_matches_frontier(spark, path_graph):
    from networkit_spark.operators.distance import bfs_distances

    got = {r["node"]: r["dist"] for r in bfs_algebraic(path_graph, 0).collect()}
    want = {
        r["node"]: r["dist"]
        for r in bfs_distances(path_graph, 0).collect()
        if r["dist"] is not None and r["dist"] >= 0
    }
    assert got == want


def test_reachability_logical(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 1.0)]
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )
    assert {r["node"] for r in reachability(g, 0).collect()} == {0, 1, 2}
    assert {r["node"] for r in reachability(g, 5).collect()} == {5, 6}


def test_csr_spmv_semiring_matches_mxv(spark, path_graph):
    """The salted-CSR physical path under MIN_PLUS equals the declarative
    mxv — the layout.py generalization subsumes algebraic supersteps."""
    from networkit_spark.plans.layout import build_csr_blocks, spmv_superstep

    g = path_graph
    e = g.sym().select("src", "dst", F.col("weight").alias("p"))
    blocks, need = build_csr_blocks(g, num_buckets=4, edges_with_values=e)
    ranks = spark.createDataFrame([(0, 0.0), (1, 1.0)], "node long, score double")
    got = {
        r["dst"]: r["mass"]
        for r in spmv_superstep(blocks, need, ranks, semiring=MIN_PLUS).collect()
    }
    A = adjacency_matrix(g)
    want = {
        r["node"]: r["value"]
        for r in mxv(A, ranks.withColumnRenamed("score", "value"), MIN_PLUS).collect()
    }
    assert got == pytest.approx(want)
