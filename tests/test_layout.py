import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.plans.layout import build_csr_blocks, pagerank_csr

from conftest import PR8_EDGES
from reference_oracles import numpy_pagerank


def scores_vec(df, n):
    rows = {r["node"]: r["score"] for r in df.collect()}
    return np.array([rows.get(i, 0.0) for i in range(n)])


def test_csr_blocks_cover_all_edges(spark):
    g = Graph.from_edge_list(spark, PR8_EDGES, weighted=True, num_nodes=8)
    blocks, need = build_csr_blocks(g, num_buckets=4)
    rows = blocks.collect()
    total_edges = sum(len(r["dsts"]) for r in rows)
    assert total_edges == g.sym().count()
    for r in rows:
        assert len(r["offsets"]) == len(r["srcs"]) + 1
        assert r["offsets"][-1] == len(r["dsts"]) == len(r["ps"])


def test_pagerank_csr_equals_sql_plan(spark):
    g = Graph.from_edge_list(spark, PR8_EDGES, weighted=True, num_nodes=8)
    a = scores_vec(pagerank(g, fixed_iters=15), 8)
    b = scores_vec(pagerank_csr(g, fixed_iters=15, num_buckets=4), 8)
    assert np.allclose(a, b, atol=1e-12)
    # converged CSR run matches the reference update-rule replica
    conv = scores_vec(pagerank_csr(g, tol=1e-10, num_buckets=4), 8)
    exact = numpy_pagerank(PR8_EDGES, 8, tol=1e-12)
    assert np.allclose(conv, exact, atol=1e-6)


def test_pagerank_csr_with_salting(spark):
    """Hub vertex split across salted buckets must not change results."""
    from networkit_spark.generators import hub_skew_graph

    g = hub_skew_graph(spark, 200, 3000, hub_fraction=0.2, seed=5)
    plain = scores_vec(pagerank(g, fixed_iters=10), 200)
    # salt_threshold=50 forces the hub's adjacency to split across buckets
    salted = scores_vec(
        pagerank_csr(g, fixed_iters=10, num_buckets=8, salt_threshold=50), 200
    )
    assert np.allclose(plain, salted, atol=1e-12)


def test_salting_splits_hub_rows(spark):
    from networkit_spark.generators import hub_skew_graph

    g = hub_skew_graph(spark, 200, 3000, hub_fraction=0.2, seed=5)
    hub_deg = (
        g.sym().groupBy("src").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    blocks, need = build_csr_blocks(g, num_buckets=8, salt_threshold=50, salts=8)
    # the hub must appear in multiple buckets; light vertices in exactly one
    hub_buckets = need.filter(F.col("src") == hub_deg["src"]).count()
    assert hub_buckets > 1
    light = need.groupBy("src").count().filter(F.col("count") > 1)
    heavy_srcs = {
        r["src"]
        for r in g.sym().groupBy("src").count().filter(F.col("count") > 50).collect()
    }
    for r in light.collect():
        assert r["src"] in heavy_srcs


def test_csr_block_chunking_preserves_spmv(spark):
    """max_block_edges splits a bucket into multiple rows (src spanning a
    chunk boundary included); the SpMV result is identical to unchunked."""
    from networkit_spark.plans.layout import spmv_superstep
    from networkit_spark.testgraph import lineitem_graph

    g = lineitem_graph(spark, "/root/testdata/sf0.001", n_nodes=300)
    ranks = g.nodes().select("node", (F.col("node") % 7 / 7.0 + 0.1).alias("score"))
    blocks1, need1 = build_csr_blocks(g, num_buckets=4)
    blocksN, needN = build_csr_blocks(g, num_buckets=4, max_block_edges=50)
    assert blocksN.count() > blocks1.count()  # chunking actually happened
    r1 = {
        r["dst"]: r["mass"]
        for r in spmv_superstep(blocks1, need1, ranks).collect()
    }
    rN = {
        r["dst"]: r["mass"]
        for r in spmv_superstep(blocksN, needN, ranks).collect()
    }
    assert set(r1) == set(rN)
    for k in r1:
        assert abs(r1[k] - rN[k]) < 1e-9
