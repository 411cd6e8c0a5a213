"""IO format readers/writers: SNAP, KONECT, MatrixMarket, GML, GraphML,
GEXF, DOT — parse fixtures + roundtrips."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.sources.formats import (
    read_gexf, read_gml, read_graphml, read_konect, read_matrix_market,
    read_snap, write_dot, write_gexf, write_gml, write_graphml,
)


def _edge_set(g):
    return {(r["src"], r["dst"]) for r in g.edges.collect()}


def _mk(spark, rows, directed=False, weighted=False):
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(df, directed=directed, weighted=weighted)


def test_snap_reader(spark, tmp_path):
    p = tmp_path / "snap.txt"
    p.write_text("# comment\n# another\n5\t7\n7\t9\n5\t9\n9\t5\n")
    g = read_snap(spark, str(p))
    # dense remap 5,7,9 -> 0,1,2; undirected dedups the 5-9/9-5 pair
    assert _edge_set(g) == {(0, 1), (1, 2), (0, 2)}
    gd = read_snap(spark, str(p), directed=True)
    assert gd.edges.count() == 4


def test_konect_sym_weighted(spark, tmp_path):
    p = tmp_path / "konect.tsv"
    p.write_text("% sym posweighted\n% 3 3\n1 2 2.5\n2 3 1.0\n1 3 4.0\n3 1 1.0\n")
    g = read_konect(spark, str(p))
    assert not g.directed and g.weighted
    w = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    # 1-based -> 0-based; (1,3)+(3,1) sum to 5.0
    assert w == {(0, 1): 2.5, (1, 2): 1.0, (0, 2): 5.0}


def test_konect_asym_unweighted(spark, tmp_path):
    p = tmp_path / "konect2.tsv"
    p.write_text("% asym unweighted\n1 2\n2 1\n2 3\n2 3\n")
    g = read_konect(spark, str(p))
    assert g.directed and not g.weighted
    assert _edge_set(g) == {(0, 1), (1, 0), (1, 2)}


def test_matrix_market(spark, tmp_path):
    p = tmp_path / "mm.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n% c\n4 4 3\n"
        "1 2 1.5\n2 3 2.0\n1 4 1.0\n"
    )
    g = read_matrix_market(spark, str(p))
    assert not g.directed and g.num_nodes() == 4
    assert _edge_set(g) == {(0, 1), (1, 2), (0, 3)}


def test_gml_roundtrip(spark, tmp_path):
    g0 = _mk(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 3, 1.0)])
    p = tmp_path / "g.gml"
    write_gml(g0, str(p))
    g1 = read_gml(spark, str(p))
    assert _edge_set(g1) == _edge_set(g0)
    assert g1.num_nodes() == 4 and not g1.directed


def test_graphml_roundtrip_weighted_directed(spark, tmp_path):
    g0 = _mk(spark, [(0, 1, 2.0), (1, 2, 0.5), (2, 0, 1.5)],
             directed=True, weighted=True)
    p = tmp_path / "g.graphml"
    write_graphml(g0, str(p))
    g1 = read_graphml(spark, str(p))
    assert g1.directed and g1.weighted
    w = {(r["src"], r["dst"]): r["weight"] for r in g1.edges.collect()}
    assert w == {(0, 1): 2.0, (1, 2): 0.5, (2, 0): 1.5}


def test_gexf_roundtrip(spark, tmp_path):
    g0 = _mk(spark, [(0, 1, 3.0), (1, 2, 1.0)], weighted=True)
    p = tmp_path / "g.gexf"
    write_gexf(g0, str(p))
    g1 = read_gexf(spark, str(p))
    assert g1.weighted and not g1.directed
    w = {(r["src"], r["dst"]): r["weight"] for r in g1.edges.collect()}
    assert w == {(0, 1): 3.0, (1, 2): 1.0}


def test_dot_writer(spark, tmp_path):
    g0 = _mk(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    p = tmp_path / "g.dot"
    write_dot(g0, str(p))
    text = p.read_text()
    assert text.startswith("graph G {") and "0 -- 1;" in text and "1 -- 2;" in text


def test_graphtool_binary_roundtrip(spark, tmp_path):
    """GraphToolBinary write→read preserves the edge set, direction flag,
    and node count (GraphToolBinary{Reader,Writer}.cpp parity)."""
    from networkit_spark.graph import Graph
    from networkit_spark.sources.formats import (
        read_graphtool_binary,
        write_graphtool_binary,
    )

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0)]
    for directed in (False, True):
        g = Graph.from_edge_list(
            spark, edges, directed=directed, num_nodes=6
        )
        path = str(tmp_path / f"g_{directed}.gt")
        write_graphtool_binary(g, path)
        # header magic sanity
        raw = open(path, "rb").read()
        assert raw[:6] == bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])
        back = read_graphtool_binary(spark, path)
        assert back.directed == directed
        assert back.num_nodes() == 6
        want = {
            (a, b) if directed else (min(a, b), max(a, b)) for a, b in edges
        }
        got = {(r["src"], r["dst"]) for r in back.edges.collect()}
        assert got == want
