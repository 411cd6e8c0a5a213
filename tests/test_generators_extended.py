"""Round-2 generator families (reference cpp/generators/): Watts-Strogatz,
Chung-Lu (exact + sampled), Havel-Hakimi, Dorogovtsev-Mendes, edge
switching, powerlaw degree sequences, hyperbolic, LFR — plus the
distributed weighted-sampling primitive they build on."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.generators import (
    chung_lu,
    chung_lu_sampled,
    dorogovtsev_mendes,
    edge_switching,
    fit_powerlaw_gamma,
    havel_hakimi,
    hyperbolic,
    lfr,
    powerlaw_degree_sequence,
    watts_strogatz,
)
from networkit_spark.plans.sample import weighted_sample


def _degrees(g):
    return {r["node"]: r["degree"] for r in g.degrees().collect()}


def test_weighted_sample_proportional_and_deterministic(spark):
    items = spark.createDataFrame(
        [(0, 1.0), (1, 10.0), (2, 100.0)], "node long, w double"
    )
    s1 = weighted_sample(items, "w", 2000, seed=7).groupBy("node").count()
    counts = {r["node"]: r["count"] for r in s1.collect()}
    assert sum(counts.values()) == 2000  # every trial matched exactly one item
    assert counts[2] > counts[1] > counts.get(0, 0)
    assert counts[2] / 2000 == pytest.approx(100 / 111, abs=0.05)
    s2 = weighted_sample(items, "w", 2000, seed=7).groupBy("node").count()
    assert {r["node"]: r["count"] for r in s2.collect()} == counts


def test_powerlaw_degree_sequence(spark):
    deg = powerlaw_degree_sequence(spark, 2000, gamma=2.5, min_deg=2, max_deg=100)
    rows = deg.agg(
        F.min("degree"), F.max("degree"), F.avg("degree"), F.count("*")
    ).collect()[0]
    assert rows[0] >= 2 and rows[1] <= 100 and rows[3] == 2000
    assert rows[1] > 10  # heavy tail reaches far past the minimum
    assert 2.0 < rows[2] < 10.0  # mean stays near the low end for gamma=2.5


def test_watts_strogatz_lattice_and_rewired(spark):
    g0 = watts_strogatz(spark, 60, k=4, p=0.0)
    assert g0.edges.count() == 120  # exact ring lattice: n*k/2
    d = _degrees(g0)
    assert all(v == 4 for v in d.values())
    g1 = watts_strogatz(spark, 60, k=4, p=0.3, seed=1)
    e0 = {(r["src"], r["dst"]) for r in g0.edges.select("src", "dst").collect()}
    e1 = {(r["src"], r["dst"]) for r in g1.edges.select("src", "dst").collect()}
    assert e1 != e0 and len(e1 & e0) > 0  # rewired some, kept some


def test_chung_lu_expected_degrees(spark):
    deg = spark.createDataFrame(
        [(i, 4.0 if i < 90 else 40.0) for i in range(100)], "node long, degree double"
    )
    g = chung_lu(spark, deg, seed=3)
    d = _degrees(g)
    hubs = sum(d.get(i, 0) for i in range(90, 100)) / 10
    rest = sum(d.get(i, 0) for i in range(90)) / 90
    assert hubs > 3 * rest  # heavy nodes get ~10x the degree in expectation


def test_chung_lu_sampled_matches_weights(spark):
    deg = spark.createDataFrame(
        [(i, 4.0 if i < 90 else 40.0) for i in range(100)], "node long, degree double"
    )
    g = chung_lu_sampled(spark, deg, seed=3)
    wd = {r["node"]: r["wdeg"] for r in g.weighted_degrees().collect()}
    hubs = sum(wd.get(i, 0) for i in range(90, 100)) / 10
    rest = sum(wd.get(i, 0) for i in range(90)) / 90
    assert hubs > 3 * rest


def test_havel_hakimi_realizes_sequence(spark):
    seq = [3, 3, 2, 2, 2, 2, 1, 1]
    g = havel_hakimi(spark, seq)
    d = _degrees(g)
    assert sorted(d.values(), reverse=True) == sorted(seq, reverse=True)
    with pytest.raises(ValueError):
        havel_hakimi(spark, [5, 1, 1])


def test_dorogovtsev_mendes_shape(spark):
    g = dorogovtsev_mendes(spark, 50, seed=5)
    assert g.num_nodes() == 50
    assert g.edges.count() == 2 * 50 - 3
    # every node beyond the seed triangle has degree >= 2
    d = _degrees(g)
    assert all(d[i] >= 2 for i in range(50))


def test_edge_switching_preserves_degrees(spark):
    g = watts_strogatz(spark, 80, k=6, p=0.0)
    before = _degrees(g)
    g2 = edge_switching(g, rounds=6, seed=9)
    after = _degrees(g2)
    assert after == before  # degree sequence is invariant
    e0 = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    e1 = {(r["src"], r["dst"]) for r in g2.edges.select("src", "dst").collect()}
    assert e1 != e0  # but the edge set actually moved
    assert len(e1) == len(e0)


def test_hyperbolic_basic(spark):
    g = hyperbolic(spark, 500, avg_degree=8.0, gamma=3.0, seed=11)
    n = g.num_nodes()
    m = g.edges.count()
    avg = 2.0 * m / n
    assert 2.0 < avg < 32.0  # right order of magnitude for target 8
    dmax = g.degrees().agg(F.max("degree")).collect()[0][0]
    assert dmax > 3 * avg  # heavy-tailed hubs exist


def test_lfr_plp_recovers_partition(spark):
    from networkit_spark.operators.community import plp
    from networkit_spark.operators.measures import adjusted_rand_measure

    g, truth = lfr(
        spark, 300, mu=0.05, gamma=2.5, beta=1.5,
        min_deg=6, max_deg=30, min_comm=40, max_comm=80, seed=13,
    )
    labels = plp(g)
    dist = adjusted_rand_measure(
        truth.select("node", F.col("community").alias("label")),
        labels.select("node", "label"),
    )
    assert dist < 0.35  # ARI distance small -> planted partition recovered


def test_fit_powerlaw_gamma(spark):
    deg = powerlaw_degree_sequence(spark, 3000, gamma=2.5, min_deg=2, max_deg=300)
    from networkit_spark.graph import Graph

    # fit on a star-free synthetic graph: use degrees directly via a fake graph
    class _G:
        def degrees(self_inner):
            return deg

    got = fit_powerlaw_gamma(_G(), min_deg=2)
    assert 1.8 < got < 3.5


def test_watts_strogatz_rewire_validity(spark):
    """Rewired endpoints avoid the source and its ring neighborhood (the
    reference redraws; the distributed analog uses an 8-candidate fan), so
    high-p generation keeps ~n*k/2 edges instead of systematically losing
    self/lattice collisions."""
    from networkit_spark.generators import watts_strogatz

    n, k = 400, 4
    g = watts_strogatz(spark, n=n, k=k, p=0.5, seed=3)
    m = g.num_edges()
    # loss now only from two rewired edges colliding on the same pair
    assert m >= n * k // 2 - 5
    half = k // 2
    rows = g.edges.select("src", "dst").collect()
    for r in rows:
        gap = min((r["dst"] - r["src"]) % n, (r["src"] - r["dst"]) % n)
        assert gap >= 1  # never a self-loop
