"""Host-level web graph (sources/webgraph.py): collapse the page link graph
by URL host and analyze at host granularity.

The reference has no pages/host source (nearest analog: EdgeListReader.cpp's
string→dense-id mapping); this is the web-scale-tier extension. Tests build
a tiny hand-written pages table with known host structure plus a
synthesize_pages round-trip, and check exact counts, weights, and PageRank
invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.sources.pages import synthesize_pages
from networkit_spark.sources.webgraph import (
    canonical_url,
    host_edges,
    host_graph,
    host_of,
    host_pagerank,
    host_spam_mass,
    host_stats,
    host_trustrank,
    page_links,
)


def _mk_pages(spark, rows):
    """rows: list of (url, [href, ...]) — html embeds one anchor per href."""
    data = []
    for url, hrefs in rows:
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        data.append((url, ("<html><body>" + body + "</body></html>").encode()))
    return spark.createDataFrame(data, "url string, html binary")


PAGES = [
    # a.example: 2 pages, links within host and to b
    ("https://a.example/1", ["https://a.example/2", "https://b.example/1"]),
    ("https://a.example/2", ["https://b.example/1", "https://b.example/2"]),
    # b.example: 2 pages, one link back to a, one dangling-out href
    ("https://b.example/1", ["https://a.example/1"]),
    ("https://b.example/2", ["https://offsite.example/x"]),
    # c.example: isolated page, no links
    ("https://c.example/1", []),
]


def test_host_of_extracts_authority(spark):
    df = spark.createDataFrame(
        [("https://Sub.Host.example:8080/p?q=1",), ("ftp://x.y/z",)], ["url"]
    ).select(host_of("url").alias("h"))
    assert [r.h for r in df.collect()] == ["Sub.Host.example:8080", "x.y"]


def test_canonical_url(spark):
    cases = [
        # (input, expected)
        ("HTTPS://Ex.COM:443/Path/X?q=1#frag", "https://ex.com/Path/X?q=1"),
        ("http://a.com:80/", "http://a.com/"),
        ("http://a.com:8080/x", "http://a.com:8080/x"),  # non-default port kept
        ("https://a.com", "https://a.com/"),  # empty path -> /
        ("https://a.com?q=1", "https://a.com/?q=1"),
        ("https://a.com/x?", "https://a.com/x"),  # empty query stripped
        ("https://a.com/UPPER/Case", "https://a.com/UPPER/Case"),  # path untouched
        ("not a url", "not a url"),  # schemeless passes through
        ("http://b.com:80x/", "http://b.com:80x/"),  # :80x is not port 80
        # userinfo is case-SENSITIVE (RFC 3986 §3.2.1) and kept verbatim
        ("https://AliceToken@API.Example/x", "https://AliceToken@api.example/x"),
        # default-port stripping reaches userinfo-bearing authorities
        ("http://u:Pw@H.com:80/p", "http://u:Pw@h.com/p"),
        # ... and IPv6 literals
        ("http://[2001:DB8::1]:80/p", "http://[2001:db8::1]/p"),
        ("https://[2001:db8::1]:443", "https://[2001:db8::1]/"),
        # :443 on http (or :80 on https) is NOT a default port
        ("http://a.com:443/x", "http://a.com:443/x"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["u"]).select(
        "u", canonical_url("u").alias("c")
    )
    got = {r.u: r.c for r in df.collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)


def test_page_links_corpus_restriction(spark):
    pages = _mk_pages(spark, PAGES)
    links = page_links(pages).collect()
    # offsite.example/x is not in the corpus -> dropped
    assert all("offsite" not in r.href for r in links)
    assert len(links) == 5
    unrestricted = page_links(pages, restrict_to_corpus=False)
    assert unrestricted.count() == 6


def test_host_edges_weights(spark):
    pages = _mk_pages(spark, PAGES)
    he = {(r.src_host, r.dst_host): r.weight for r in host_edges(pages).collect()}
    assert he == {
        ("a.example", "a.example"): 1.0,
        ("a.example", "b.example"): 3.0,
        ("b.example", "a.example"): 1.0,
    }


def test_host_stats(spark):
    pages = _mk_pages(spark, PAGES)
    st = {r.host: r for r in host_stats(pages).collect()}
    assert set(st) == {"a.example", "b.example", "c.example"}
    a, b, c = st["a.example"], st["b.example"], st["c.example"]
    assert (a.n_pages, a.out_links, a.intra_links) == (2, 4, 1)
    assert a.intra_frac == pytest.approx(0.25)
    assert (b.n_pages, b.out_links, b.intra_links) == (2, 1, 0)
    # isolated host still appears, zero-filled (ADVICE round-2 analog)
    assert (c.n_pages, c.out_links, c.intra_links, c.intra_frac) == (1, 0, 0, 0.0)


def test_host_graph_dense_ids(spark):
    pages = _mk_pages(spark, PAGES)
    g, id_map = host_graph(pages)
    ids = {r.host: r.node for r in id_map.collect()}
    # dense 0..H-1 by sorted host name; c has no edges -> not in graph
    assert ids == {"a.example": 0, "b.example": 1}
    assert g.directed and g.weighted
    edges = {(r.src, r.dst): r.weight for r in g.edges.collect()}
    assert edges == {(0, 0): 1.0, (0, 1): 3.0, (1, 0): 1.0}
    # drop_intra removes the self-loop host pair
    g2, _ = host_graph(pages, drop_intra=True)
    assert g2.edges.count() == 2


def test_host_pagerank_invariants(spark):
    pages = _mk_pages(spark, PAGES)
    pr = host_pagerank(pages, fixed_iters=15).collect()
    scores = {r.host: r.score for r in pr}
    assert set(scores) == {"a.example", "b.example"}
    assert sum(scores.values()) == pytest.approx(1.0, abs=1e-9)
    # a keeps 1/4 of its own outflow AND receives all of b's -> a > b
    assert scores["a.example"] > scores["b.example"] > 0


def test_host_trustrank_flows_from_seeds(spark):
    """Trust flows only along directed out-links from the trusted set: a
    host unreachable from the seeds gets zero trust; seeds keep the most."""
    pages = _mk_pages(
        spark,
        [
            # a -> b -> c chain; d links INTO a but is unreachable from it
            ("https://a.example/1", ["https://b.example/1"]),
            ("https://b.example/1", ["https://c.example/1"]),
            ("https://c.example/1", []),
            ("https://d.example/1", ["https://a.example/1"]),
        ],
    )
    tr = {
        r.host: r.trust
        for r in host_trustrank(pages, ["a.example"], fixed_iters=30).collect()
    }
    assert tr["a.example"] > tr["b.example"] > tr["c.example"] > 0
    assert tr["d.example"] == 0.0
    # raw trust leaks at the dangling host c -> strictly less than 1
    assert 0 < sum(tr.values()) < 1
    with pytest.raises(ValueError):
        host_trustrank(pages, ["nosuch.example"], fixed_iters=5)


def test_host_spam_mass(spark):
    """Hosts whose rank is unsupported by the trusted core get rel_mass near
    1; the trusted seed goes negative (more trust than rank)."""
    pages = _mk_pages(
        spark,
        [
            # trusted a endorses b; spam ring s1<->s2 boosts itself only
            ("https://a.example/1", ["https://b.example/1"]),
            ("https://b.example/1", ["https://a.example/1"]),
            ("https://s1.example/1", ["https://s2.example/1"]),
            ("https://s2.example/1", ["https://s1.example/1"]),
        ],
    )
    sm = {r.host: r for r in host_spam_mass(pages, ["a.example"], fixed_iters=40).collect()}
    assert set(sm) == {"a.example", "b.example", "s1.example", "s2.example"}
    for r in sm.values():
        assert r.score > 0 and abs(r.rel_mass - (r.score - r.trust) / r.score) < 1e-12
    # spam ring: zero trust -> rel_mass == 1; trusted host over-supported
    assert sm["s1.example"].rel_mass == pytest.approx(1.0)
    assert sm["s2.example"].rel_mass == pytest.approx(1.0)
    assert sm["a.example"].rel_mass < 0
    assert sum(r.trust for r in sm.values()) == pytest.approx(1.0)


def test_synthesized_pages_host_rollup(spark):
    """End-to-end over the synthetic pages source: every host is siteK
    .example (K = node % 97), and the host-edge weight total equals the
    distinct symmetrized page-link count."""
    g = Graph.from_edge_list(spark, [(i, (i * 7 + 1) % 50) for i in range(50)])
    pages = synthesize_pages(g)
    he = host_edges(pages)
    total = he.agg(F.sum("weight")).first()[0]
    sym_links = g.sym().select("src", "dst").distinct().count()
    assert total == float(sym_links)
    hosts = he.select("src_host").union(he.select("dst_host")).distinct()
    assert all(
        r[0].startswith("site") and r[0].endswith(".example")
        for r in hosts.collect()
    )
