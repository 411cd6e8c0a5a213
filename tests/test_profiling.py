"""Profile suite runner (reference networkit/profiling/profiling.py:230-301):
composes the default measure set over a shared cached graph and reports the
aggregate edges/s figure."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.profiling import profile, profile_report


def test_profile_suite_composes(spark):
    edges = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 5) % 20) for i in range(20)]
    g = Graph.from_edge_list(spark, sorted(set(tuple(sorted(e)) for e in edges)))
    res = profile(g, num_samples=4)
    assert set(res["measures"]) == {
        "degree", "coreness", "lcc", "pagerank", "kpath", "katz",
        "approx_betweenness", "approx_closeness", "plm", "plp",
        "connected_components", "powerlaw_gamma",
    }
    assert res["measures"]["powerlaw_gamma"]["value"] > 1.0  # MLE lower bound
    n = g.num_nodes()
    for name in ("degree", "coreness", "lcc", "pagerank", "katz"):
        assert res["measures"][name]["rows"] == n, name
    assert res["edges_per_sec"] > 0
    report = profile_report(res)
    assert "total speed:" in report and "edges/s" in report


def test_profile_subset_and_unknown(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)])
    res = profile(g, measures=["degree", "connected_components"])
    assert set(res["measures"]) == {"degree", "connected_components"}
    with pytest.raises(ValueError):
        profile(g, measures=["nope"])
