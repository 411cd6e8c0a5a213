"""Kernel regression guard (round-4 verdict item #7): the per-query
superstep/round counts at sf0.01 must match the committed
BENCH/supersteps.json EXACTLY (round counts are deterministic — an extra
round means an algorithmic regression, e.g. a lost doubling shortcut or a
broken frontier rule), and wall time per kernel must stay within a GENEROUS
band of the artifact (6x — the sandbox host's deliverable compute drifts
>2x, BENCH/cpu_calibration.json; the band only catches order-of-magnitude
per-round cost regressions, the counts catch everything algorithmic)."""

import json
import os
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "BENCH", "supersteps.json")
SF_DIR = "/root/testdata/sf0.01"
WALL_BAND = 6.0

with open(ART) as f:
    EXPECT = json.load(f)


@pytest.fixture(scope="module")
def graphs(spark):
    from networkit_spark.testgraph import lineitem_graph

    return (
        lineitem_graph(spark, SF_DIR),
        lineitem_graph(spark, SF_DIR, directed=True),
    )


def _walled(name, fn):
    t0 = time.time()
    out = fn()
    sec = time.time() - t0
    assert sec <= WALL_BAND * EXPECT[name]["sec"], (
        f"{name}: {sec:.1f}s vs artifact {EXPECT[name]['sec']}s "
        f"(band {WALL_BAND}x)"
    )
    return out


@pytest.mark.slow
def test_pagerank_supersteps(graphs):
    from networkit_spark.operators.pagerank import pagerank

    pr = _walled("pagerank", lambda: pagerank(graphs[0], tol=1e-9))
    assert pr._iterations == EXPECT["pagerank"]["supersteps"]


@pytest.mark.slow
def test_cc_supersteps(graphs):
    from networkit_spark.operators.components import connected_components

    cc = _walled("connected_components", lambda: connected_components(graphs[0]))
    assert cc._iterations == EXPECT["connected_components"]["supersteps"]


@pytest.mark.slow
def test_scc_rounds(graphs):
    from networkit_spark.operators.components import strongly_connected_components

    st = {}
    _walled("scc", lambda: strongly_connected_components(graphs[1], stats=st).count())
    for k in ("outer", "trim", "color", "bmin"):
        assert st[k] == EXPECT["scc"][k], (k, st)


@pytest.mark.slow
def test_plp_supersteps(graphs):
    from networkit_spark.operators.community import plp

    labels = _walled("plp", lambda: plp(graphs[0]))
    assert labels._iterations == EXPECT["plp"]["supersteps"]


@pytest.mark.slow
def test_ktruss_rounds(graphs):
    from networkit_spark.operators.triangles import k_truss

    st = {}
    _walled("ktruss", lambda: k_truss(graphs[0], 4, stats=st).count())
    assert st["rounds"] == EXPECT["ktruss"]["rounds"]
    assert st["frontiers"] == EXPECT["ktruss"]["frontiers"]


@pytest.mark.slow
def test_path_growing_rounds(graphs):
    from networkit_spark.operators.matching import path_growing_matching

    st = {}
    _walled("path_growing", lambda: path_growing_matching(graphs[0], stats=st).count())
    assert st["rounds"] == EXPECT["path_growing"]["rounds"]
    assert st["grown_edges"] == EXPECT["path_growing"]["grown_edges"]


@pytest.mark.slow
def test_rsf_rounds(graphs):
    from networkit_spark.operators.misc import random_spanning_forest

    st = {}
    _walled("rsf", lambda: random_spanning_forest(graphs[0], stats=st).count())
    assert st["rounds"] == EXPECT["rsf"]["rounds"]
