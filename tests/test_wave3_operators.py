"""Third-wave operator tests: greedy matching, extra edge scores, hop plot,
sampled APSP, exact effective diameter, link-prediction evaluation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import (
    is_proper_matching,
    local_max_matching,
    matching_weight,
)
from networkit_spark.operators.sparsification import (
    geometric_mean_score,
    local_similarity_score,
    scan_structural_score,
)
from networkit_spark.operators.distance import (
    apsp_sampled,
    bfs_distances,
    effective_diameter_approx,
    effective_diameter_exact,
    hop_plot_approx,
)
from networkit_spark.operators.linkprediction import (
    evaluate_predictions,
    link_prediction_scores,
    random_link_sampler,
)

from conftest import CC20_EDGES, LCC16_EDGES


def test_local_max_matching_path(spark):
    # path 0-1-2-3 with weights 1, 5, 1: local-max picks the middle edge
    g = Graph.from_edge_list(
        spark, [(0, 1, 1.0), (1, 2, 5.0), (2, 3, 1.0)], weighted=True
    )
    m = local_max_matching(g)
    rows = {(r["src"], r["dst"]) for r in m.collect()}
    assert rows == {(1, 2)}
    assert is_proper_matching(m)
    assert matching_weight(m) == 5.0


def test_local_max_matching_proper_on_larger_graph(spark):
    g = Graph.from_edge_list(spark, LCC16_EDGES)
    m = local_max_matching(g)
    assert is_proper_matching(m)
    # maximal: no remaining edge has both endpoints unmatched
    matched = {r["src"] for r in m.collect()} | {r["dst"] for r in m.collect()}
    for u, v in LCC16_EDGES:
        assert u in matched or v in matched


def test_scan_structural_score_triangle(spark):
    # triangle: every edge has tri=1, du=dv=2 → (1+2)/sqrt(3*3) = 1.0
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)])
    s = scan_structural_score(g)
    for r in s.collect():
        assert abs(r["score"] - 1.0) < 1e-12


def test_geometric_mean_score_normalizes(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)])
    base = g.edges.select("src", "dst", F.lit(1.0).alias("score"))
    out = geometric_mean_score(g, base)
    # each node's incident mass = 2 → every edge: 1/sqrt(2*2) = 0.5
    for r in out.collect():
        assert abs(r["score"] - 0.5) < 1e-12


def test_local_similarity_score_range(spark):
    g = Graph.from_edge_list(spark, LCC16_EDGES)
    out = local_similarity_score(g)
    assert out.count() == len(LCC16_EDGES)
    for r in out.collect():
        assert 0.0 <= r["score"] <= 1.0 + 1e-12


def test_hop_plot_monotone_and_ends_at_one(spark):
    g = Graph.from_edge_list(spark, CC20_EDGES)
    hp = hop_plot_approx(g, num_sketches=16)
    assert hp, "non-empty"
    vals = [v for _, v in hp]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    assert abs(vals[-1] - 1.0) < 1e-9


def test_apsp_sampled_matches_bfs(spark):
    g = Graph.from_edge_list(spark, CC20_EDGES)
    out = apsp_sampled(g, [0, 3]).collect()
    d0 = {r["node"]: r["dist"] for r in bfs_distances(g, 0).collect()}
    got0 = {r["node"]: r["dist"] for r in out if r["source"] == 0}
    assert got0 == d0


def test_effective_diameter_exact_path(spark):
    # path of 5 nodes: pairs within h hops known in closed form
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    d = effective_diameter_exact(g, ratio=1.0)
    assert abs(d - 4.0) < 1e-9  # all 25 ordered pairs reached at hop 4
    d9 = effective_diameter_exact(g, ratio=0.9)
    assert 2.0 < d9 <= 4.0


def test_random_link_sampler_deterministic(spark):
    g = Graph.from_edge_list(spark, LCC16_EDGES)
    a = random_link_sampler(g, 0.5, seed=7).edges.count()
    b = random_link_sampler(g, 0.5, seed=7).edges.count()
    assert a == b
    assert 0 < a < len(LCC16_EDGES)


def test_evaluate_predictions_perfect_ranking(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    pairs = spark.createDataFrame(
        [(0, 3), (1, 3), (0, 2)], "u long, v long"
    )
    scores = pairs.withColumn(
        "score",
        F.when((F.col("u") == 0) & (F.col("v") == 2), 1.0).otherwise(0.1),
    )
    truth = spark.createDataFrame([(0, 2)], "u long, v long")
    m = evaluate_predictions(scores, truth)
    assert m["auc_roc"] == 1.0
    assert m["average_precision"] == 1.0


def test_neighborhood_distance_column(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    pairs = spark.createDataFrame([(0, 2), (0, 3)], "u long, v long")
    out = {
        (r["u"], r["v"]): r["neighborhood_distance"]
        for r in link_prediction_scores(g, pairs).collect()
    }
    # (0,2): cn=1 (node 1), du=2, dv=3 → 1/sqrt(6)
    assert abs(out[(0, 2)] - 1.0 / math.sqrt(6)) < 1e-12
