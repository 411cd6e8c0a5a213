import hashlib

import pytest
from pyspark.sql import functions as F

from networkit_spark.generators import clustered_random, erdos_renyi, hub_skew_graph, rmat
from networkit_spark.graph import Graph
from networkit_spark.sources.edgelist import read_edge_list, read_metis, write_edge_list
from networkit_spark.sources.pages import (
    _extract_text_py,
    assign_node_ids,
    extract_and_verify,
    pages_to_edges,
    synthesize_pages,
)


def test_edge_list_roundtrip(spark, tmp_path):
    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 0.5)]
    g = Graph.from_edge_list(spark, edges, weighted=True)
    path = str(tmp_path / "el")
    write_edge_list(g.edges, path, weighted=True)
    g2 = read_edge_list(spark, path, weighted=True)
    assert sorted(map(tuple, g2.edges.collect())) == sorted(
        map(tuple, g.edges.collect())
    )


def test_edge_list_comments_and_offset(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "f.txt").write_text("# comment\n1\t2\n2\t3\n\n# another\n3\t1\n")
    g = read_edge_list(spark, str(p), first_node=1)
    assert g.num_edges() == 3
    assert g.nodes().agg(F.min("node")).collect()[0][0] == 0


def test_edge_list_noncontinuous(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "f.txt").write_text("alice bob\nbob carol\ncarol alice\n")
    g = read_edge_list(spark, str(p), separator=" ", continuous=False)
    # sorted token order: alice=0, bob=1, carol=2
    assert sorted(map(tuple, g.edges.select("src", "dst").collect())) == [
        (0, 1), (0, 2), (1, 2)
    ]


def test_metis_reader(spark, tmp_path):
    p = tmp_path / "m"
    p.mkdir()
    # triangle + pendant: node 1 adj 2,3; node 2 adj 1,3; node 3 adj 1,2,4; node 4 adj 3
    (p / "g.graph").write_text("4 4\n2 3\n1 3\n1 2 4\n3\n")
    g = read_metis(spark, str(p))
    assert g.num_nodes() == 4
    assert sorted(map(tuple, g.edges.select("src", "dst").collect())) == [
        (0, 1), (0, 2), (1, 2), (2, 3)
    ]


def test_metis_writer_roundtrip_gapped_ids(spark, tmp_path):
    """write_metis densely remaps gapped node ids in sorted order
    (METISGraphWriter.cpp:16-40 analog); reader recovers the remapped edge
    set exactly."""
    from networkit_spark.sources.edgelist import write_metis

    edges = [(10, 20), (20, 40), (40, 10), (40, 70)]
    g = Graph.from_edge_list(spark, edges, num_nodes=None)
    path = str(tmp_path / "g.graph")
    write_metis(g, path)
    lines = open(path).read().splitlines()
    assert lines[0] == "4 4"
    g2 = read_metis(spark, path)
    assert g2.num_nodes() == 4
    # sorted-order remap: 10->0, 20->1, 40->2, 70->3
    assert sorted(map(tuple, g2.edges.select("src", "dst").collect())) == [
        (0, 1), (0, 2), (1, 2), (2, 3)
    ]


def test_pages_extraction_byte_identical(spark):
    """input_hint invariant: pandas-UDF extraction == stored text, per url,
    byte-for-byte (sha256)."""
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (0, 3)], num_nodes=5)
    pages = synthesize_pages(g)
    ok = extract_and_verify(pages).collect()
    assert len(ok) == 5 and all(r["ok"] for r in ok)


def test_pages_to_edges_recovers_graph(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 3), (1, 4)]
    g = Graph.from_edge_list(spark, edges, num_nodes=5)
    pages = synthesize_pages(g)
    ids = assign_node_ids(pages)
    derived = pages_to_edges(pages, ids)
    # urls sort lexicographically (p/0, p/1 …) → recovered ids match, and the
    # sym edge set equals the original both-orientation set
    got = sorted((r["src"], r["dst"]) for r in derived.collect())
    expected = sorted(
        {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
    )
    assert got == expected


def test_extract_text_pure_function():
    html = b'<html><head><title>T</title></head><body><p>hello  <a href="x">world</a></p></body></html>'
    assert _extract_text_py(html) == "T hello world"
    assert hashlib.sha256(_extract_text_py(html).encode()).hexdigest() == hashlib.sha256(
        b"T hello world"
    ).hexdigest()


def test_erdos_renyi_deterministic(spark):
    g1 = erdos_renyi(spark, 60, 0.1, seed=3)
    g2 = erdos_renyi(spark, 60, 0.1, seed=3)
    assert sorted(map(tuple, g1.edges.collect())) == sorted(map(tuple, g2.edges.collect()))
    m = g1.num_edges()
    assert 100 < m < 260  # E[m] = C(60,2)*0.1 = 177


def test_erdos_renyi_md5_matches_python_replica(spark):
    """Portable md5 mode: edge set equals a pure-Python hashlib replica of
    the integer-threshold Bernoulli (the gen_er oracle's contract)."""
    import hashlib

    n, p, seed = 40, 0.1, 7
    g = erdos_renyi(spark, n, p, seed=seed, hash_fn="md5")
    got = sorted((r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect())
    thresh = int(p * float(2**60))
    want = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if int(hashlib.md5(f"{i}:{j}:{seed}".encode()).hexdigest()[:15], 16) < thresh
    ]
    assert got == want and len(want) > 20


def test_rmat_shape(spark):
    g = rmat(spark, scale=8, edge_factor=8, seed=1)
    assert g.num_nodes() == 256
    deg = g.degrees().agg(F.max("degree"), F.avg("degree")).collect()[0]
    assert deg[0] > 4 * deg[1]  # power-law skew: hub ≫ mean


def test_clustered_random_plp_recovery(spark):
    from networkit_spark.operators.community import plp

    g = clustered_random(spark, 40, 4, p_in=1.0, p_out=0.0)
    labels = plp(g, max_iter=15)
    assert labels.select("label").distinct().count() == 4


def test_hub_skew_graph(spark):
    g = hub_skew_graph(spark, 500, 5000, hub_fraction=0.05)
    hub_deg = g.degrees().filter("node = 0").collect()[0]["degree"]
    avg = g.degrees().agg(F.avg("degree")).collect()[0][0]
    assert hub_deg > 5 * avg


def test_read_pages_parquet_and_catalog(spark, tmp_path):
    """read_pages: parquet-path and catalog-identifier dispatch both honor
    the input_hint schema contract; a drifted table is rejected."""
    import pytest
    from networkit_spark.generators import rmat
    from networkit_spark.sources.pages import read_pages, synthesize_pages

    pages = synthesize_pages(rmat(spark, scale=6, edge_factor=3, seed=3))
    path = str(tmp_path / "pages.parquet")
    pages.write.mode("overwrite").parquet(path)

    via_path = read_pages(spark, path)
    assert via_path.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert via_path.count() == pages.count()

    pages.write.mode("overwrite").saveAsTable("tmp_pages_tbl")
    try:
        via_table = read_pages(spark, "tmp_pages_tbl")
        assert via_table.count() == pages.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS tmp_pages_tbl")

    bad = str(tmp_path / "bad.parquet")
    pages.drop("html").write.mode("overwrite").parquet(bad)
    with pytest.raises(ValueError, match="missing input_hint columns"):
        read_pages(spark, bad)
