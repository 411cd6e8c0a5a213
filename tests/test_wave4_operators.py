"""Round-2 operators: SCC, one-pass coreness, distributed ranking helper."""

import random

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import strongly_connected_components
from networkit_spark.operators.kcore import coreness
from networkit_spark.plans.order import zip_with_index, zip_with_rank

from reference_oracles import python_coreness, python_scc


def _random_digraph(n, m, seed, planted_cycles=()):
    random.seed(seed)
    edges = set()
    while len(edges) < m:
        u, v = random.randrange(n), random.randrange(n)
        if u != v:
            edges.add((u, v))
    for base, length in planted_cycles:
        for i in range(length):
            edges.add((base + i, base + (i + 1) % length))
    return sorted(edges)


def test_scc_matches_tarjan(spark):
    n = 200
    edges = _random_digraph(n, 350, seed=3, planted_cycles=[(20, 5), (80, 7)])
    g = Graph.from_edge_list(spark, edges, directed=True, num_nodes=n)
    got = {r["node"]: r["component"] for r in strongly_connected_components(g).collect()}
    assert got == python_scc(edges, n)


def test_scc_single_cycle(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=True, num_nodes=4)
    got = {r["node"]: r["component"] for r in strongly_connected_components(g).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}


def test_coreness_one_pass_matches_sequential_peel(spark):
    n = 150
    random.seed(5)
    edges = set()
    while len(edges) < 450:
        u, v = random.randrange(n), random.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    g = Graph.from_edge_list(spark, sorted(edges), num_nodes=n)
    got = {r["node"]: r["core"] for r in coreness(g).collect()}
    assert got == python_coreness(sorted(edges), n)


def test_zip_with_rank_exact_global_order(spark):
    random.seed(9)
    rows = [(i, random.random()) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, score double").repartition(7)
    r = zip_with_rank(df, [F.desc("score"), F.asc("id")], cum_cols=["score"])
    got = sorted((x["rank"], x["id"]) for x in r.collect())
    exp = [
        (i + 1, rid)
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (-t[1], t[0])))
    ]
    assert got == sorted(exp)
    idx = zip_with_index(df.select("id"), ["id"], index_col="i")
    assert sorted((x["i"], x["id"]) for x in idx.collect()) == [(i, i) for i in range(2000)]
