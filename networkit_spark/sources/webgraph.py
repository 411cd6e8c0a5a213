"""Host-level web graph: collapse the page-level link graph by URL host.

Common-Crawl-style link-graph pipelines run most analytics twice — at page
granularity and at host/domain granularity (the host graph is ~3 orders of
magnitude smaller and is what PageRank-for-ranking, spam-mass, and
crawl-scheduling jobs actually consume). This module derives the host graph
directly from the ``input_hint`` pages table ``(url, warc_ts, html, text,
lang)``:

- hosts are extracted JVM-side with ``regexp_extract`` (whole-stage codegen;
  the only Python is the Arrow-vectorized href extraction shared with
  :mod:`.pages`),
- the page→host collapse is a single ``groupBy(src_host, dst_host)`` — at
  10^12 pages the output is ~10^8 host pairs, so every downstream operator
  (PageRank, components, …) runs on a graph that fits comfortably per
  executor,
- host ids are assigned with the distributed range-partition rank
  (plans/order.py) — no single-task global sort.

Reference parity: the reference has no pages source at all (its nearest
analog is EdgeListReader.cpp:143's string→dense-id mapping); the host
rollup is a Spark-first extension for the web-scale tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.order import zip_with_index
from .pages import extract_hrefs_udf

#: scheme://HOST — compatible between Java regex (Spark) and RE2 (DuckDB),
#: so oracles can apply the IDENTICAL pattern cross-engine.
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/]+)"


def host_of(url_col) -> F.Column:
    """URL host, extracted JVM-side (codegen; no UDF)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(c, HOST_RE, 1)


def canonical_url(url_col) -> F.Column:
    """Canonical form of a URL, entirely JVM-side (whole-stage codegen).

    Standard crawl-pipeline normalization (the equivalence class Common-Crawl
    style dedup keys on):

    1. strip the fragment (``#...`` never reaches the server),
    2. strip a trailing empty query (``?`` with nothing after it),
    3. lowercase the scheme and host:port (RFC 3986 §6.2.2.1 — scheme and
       host are case-insensitive; userinfo and the PATH are case-sensitive
       and NOT touched),
    4. strip default ports (``:80`` for http, ``:443`` for https) — matched
       at the END of the host:port part, so userinfo-bearing and
       IPv6-literal authorities (``u:pw@h:80``, ``[2001:db8::1]:80``)
       normalize too,
    5. add ``/`` when the path is empty (``https://h`` ≡ ``https://h/``).

    Composable with :func:`host_of` / :func:`page_links` so link extraction
    and dedup agree on URL identity."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(c, r"#.*$", "")
    u = F.regexp_replace(u, r"\?$", "")
    auth_re = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    authority = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_replace(u, auth_re, "")
    # host has no '@' (RFC 3986 §3.2), so the greedy match splits at the
    # LAST '@'; userinfo keeps its case
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(authority, r"^.*@", ""))
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pre = F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"), userinfo, hostport)
    )
    return F.when(pre == "", u).otherwise(
        F.concat(pre, F.when((rest == "") | rest.startswith("?"), F.concat(F.lit("/"), rest)).otherwise(rest))
    )


def page_links(pages: DataFrame, restrict_to_corpus: bool = True) -> DataFrame:
    """Distinct page-level links ``(url, href)`` extracted from html.

    ``restrict_to_corpus`` drops hrefs that point outside the pages table
    (same semantics as :func:`.pages.pages_to_edges`'s inner join on the id
    map) — a hash semi-join on the url string, broadcast when small.
    """
    links = pages.select(
        "url", F.explode(extract_hrefs_udf(F.col("html"))).alias("href")
    ).distinct()
    if restrict_to_corpus:
        corpus = pages.select(F.col("url").alias("href")).distinct()
        links = links.join(corpus, "href", "left_semi")
    return links


def host_edges(pages: DataFrame, restrict_to_corpus: bool = True) -> DataFrame:
    """Weighted host graph ``(src_host, dst_host, weight)`` where weight =
    number of distinct page-level links between the two hosts (intra-host
    links included — filter ``src_host != dst_host`` for the inter-host
    view). One shuffle: the groupBy on the (host, host) key."""
    links = page_links(pages, restrict_to_corpus)
    return (
        links.select(
            host_of("url").alias("src_host"), host_of("href").alias("dst_host")
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def host_stats(pages: DataFrame, restrict_to_corpus: bool = True) -> DataFrame:
    """Per-host rollup ``(host, n_pages, out_links, intra_links,
    intra_frac)`` — the standard crawl-health profile (how self-linked is
    each site). Hosts with zero outbound links still appear (left join from
    the page counts)."""
    hosts = (
        pages.select(host_of("url").alias("host"), "url")
        .groupBy("host")
        .agg(F.countDistinct("url").alias("n_pages"))
    )
    he = host_edges(pages, restrict_to_corpus)
    out = he.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("weight").cast("long").alias("out_links"),
        F.sum(F.when(F.col("src_host") == F.col("dst_host"), F.col("weight"))
              .otherwise(F.lit(0.0))).cast("long").alias("intra_links"),
    )
    return hosts.join(out, "host", "left").select(
        "host",
        "n_pages",
        F.coalesce("out_links", F.lit(0)).alias("out_links"),
        F.coalesce("intra_links", F.lit(0)).alias("intra_links"),
        F.round(
            F.when(
                F.coalesce("out_links", F.lit(0)) > 0,
                F.coalesce("intra_links", F.lit(0))
                / F.coalesce("out_links", F.lit(1)).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("intra_frac"),
    )


def host_graph(
    pages: DataFrame, restrict_to_corpus: bool = True, drop_intra: bool = False
) -> tuple[Graph, DataFrame]:
    """(Graph over dense host ids, id map ``(host, node)``). The host graph
    is directed + weighted; ids are dense 0..H-1 by sorted host name
    (deterministic, partitioning-independent)."""
    he = host_edges(pages, restrict_to_corpus)
    if drop_intra:
        he = he.filter(F.col("src_host") != F.col("dst_host"))
    hosts = (
        he.select(F.col("src_host").alias("host"))
        .union(he.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    id_map = zip_with_index(hosts, ["host"], index_col="node").select(
        "host", F.col("node").cast("long").alias("node")
    )
    edges = (
        he.join(
            F.broadcast(id_map.withColumnRenamed("host", "src_host")
                        .withColumnRenamed("node", "src")),
            "src_host",
        )
        .join(
            F.broadcast(id_map.withColumnRenamed("host", "dst_host")
                        .withColumnRenamed("node", "dst")),
            "dst_host",
        )
        .select("src", "dst", "weight")
    )
    return Graph(edges, directed=True, weighted=True), id_map


def host_pagerank(
    pages: DataFrame,
    damp: float = 0.85,
    fixed_iters: int | None = None,
    tol: float = 1e-9,
    restrict_to_corpus: bool = True,
) -> DataFrame:
    """PageRank at host granularity: ``(host, score)``, scores normalized to
    sum 1 (same pinned semantics as operators.pagerank.pagerank — reference
    PageRank.cpp:35-68). This is the classic two-level web ranking plan:
    collapse 10^12 pages → ~10^8 hosts once, then iterate on the small
    graph."""
    from ..operators.pagerank import pagerank

    g, id_map = host_graph(pages, restrict_to_corpus)
    pr = pagerank(g, damp=damp, fixed_iters=fixed_iters, tol=tol)
    return pr.join(F.broadcast(id_map), "node").select("host", "score")


def host_trustrank(
    pages: DataFrame,
    trusted_hosts: list[str],
    damp: float = 0.85,
    fixed_iters: int | None = None,
    max_iter: int = 100,
    tol: float = 1e-8,
    restrict_to_corpus: bool = True,
) -> DataFrame:
    """TrustRank over the host graph: ``(host, trust)``.

    Gyöngyi/Garcia-Molina/Pedersen, *Combating Web Spam with TrustRank*
    (VLDB 2004): PageRank with the teleport vector restricted to a
    human-vetted trusted seed set, propagated along DIRECTED host out-links
    — trust flows only to pages/hosts the trusted set (transitively) links
    to. Raw scores (no final normalization; the paper's t sums to <= 1,
    with leakage at dangling hosts).

    The seed list is small by construction (human-vetted), so mapping seed
    host names to dense ids is one broadcast-filtered collect; the iteration
    itself is operators.misc.personalized_pagerank on the collapsed host
    graph — at 10^12 pages this runs on ~10^8 hosts, not on pages."""
    g, id_map = host_graph(pages, restrict_to_corpus)
    return _trustrank_on(g, id_map, trusted_hosts, damp, fixed_iters, max_iter, tol)


def _trustrank_on(g, id_map, trusted_hosts, damp, fixed_iters, max_iter, tol):
    from ..operators.misc import personalized_pagerank

    seeds = [
        r.node
        for r in id_map.filter(F.col("host").isin(list(trusted_hosts))).collect()
    ]
    if not seeds:
        raise ValueError("no trusted host found in the host graph")
    tr = personalized_pagerank(
        g, seeds, damp=damp, tol=tol, max_iter=max_iter, fixed_iters=fixed_iters
    )
    return tr.join(F.broadcast(id_map), "node").select(
        "host", F.col("score").alias("trust")
    )


def host_spam_mass(
    pages: DataFrame,
    trusted_hosts: list[str],
    damp: float = 0.85,
    fixed_iters: int | None = None,
    restrict_to_corpus: bool = True,
) -> DataFrame:
    """Relative spam mass per host: ``(host, score, trust, rel_mass)``.

    Gyöngyi et al., *Link Spam Detection Based on Mass Estimation*
    (VLDB 2006): rel_mass = (p - p') / p where p is PageRank and p' the
    "good" rank estimated from the trusted core. Deterministic variant:
    both p and the TrustRank vector are normalized to sum 1 before the
    ratio, so rel_mass ∈ (-inf, 1] — near 1 means the host's rank is
    unsupported by the trusted core (spam signal); trusted hubs go
    negative. One collapsed host graph feeds both iterations — the
    page-level href extraction (the dominant stage at 10^12 pages) runs
    once, not once per ranking."""
    from ..operators.pagerank import pagerank

    g, id_map = host_graph(pages, restrict_to_corpus)
    g.edges = g.edges.persist()
    pr = pagerank(g, damp=damp, fixed_iters=fixed_iters).join(
        F.broadcast(id_map), "node"
    ).select("host", "score")
    tr = _trustrank_on(g, id_map, trusted_hosts, damp, fixed_iters, 100, 1e-8)
    tsum = tr.agg(F.sum("trust")).first()[0]
    # both rankings are checkpoint-backed past this point (the iterations
    # materialize per superstep), so the shared host-edge cache can go
    g.edges.unpersist()
    tr = tr.select("host", (F.col("trust") / F.lit(tsum)).alias("trust"))
    return pr.join(tr, "host").select(
        "host",
        "score",
        "trust",
        ((F.col("score") - F.col("trust")) / F.col("score")).alias("rel_mass"),
    )
