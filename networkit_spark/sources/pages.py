"""Common-Crawl-style pages table: synthesis, extraction, edge derivation.

This is the BASELINE.json ``input_hint`` pipeline: an Iceberg/Parquet table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
whose embedded hrefs ARE the link graph. Extraction runs in vectorized Arrow
pandas UDFs (never per-row Python) and must be byte-identical per url with
the synthesis-side expected text (tests assert sha256 equality).

Reference parity: the reference has file readers (cpp/io/*) instead of a
pages table; the href-extraction + dense-id assignment here plays the role
of EdgeListReader's id mapping (EdgeListReader.cpp:143).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, StringType

from ..graph import Graph
from ..plans.order import zip_with_index

_EPOCH = "2020-01-01 00:00:00"

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_A_RE = re.compile(r'<a href="([^"]*)">(.*?)</a>', re.S)
_WS_RE = re.compile(r"\s+")


def _extract_text_py(html: bytes) -> str:
    """Pure extraction function: title + paragraph texts + anchor texts,
    single-space normalized. Pinned — synthesis generates its expected
    ``text`` column with this exact function, so extraction is byte-identical
    by construction and any drift breaks the sha256 test."""
    s = html.decode("utf-8", errors="replace")
    parts = []
    m = _TITLE_RE.search(s)
    if m:
        parts.append(m.group(1))
    for p in _P_RE.findall(s):
        # strip anchors inside paragraphs down to their anchor text,
        # space-padded so adjacent anchors stay separate words after the
        # whitespace normalization below
        p = _A_RE.sub(lambda a: " " + a.group(2) + " ", p)
        parts.append(p)
    joined = " ".join(parts)
    return _WS_RE.sub(" ", joined).strip()


def _extract_hrefs_py(html: bytes) -> list:
    s = html.decode("utf-8", errors="replace")
    return [m[0] for m in _A_RE.findall(s)]


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: _extract_text_py(bytes(b) if b is not None else b""))


@F.pandas_udf(ArrayType(StringType()))
def extract_hrefs_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: _extract_hrefs_py(bytes(b) if b is not None else b""))


def url_of(node_col) -> F.Column:
    """Deterministic url scheme: site = node % 97, page = node."""
    c = F.col(node_col) if isinstance(node_col, str) else node_col
    return F.concat(
        F.lit("https://site"),
        (c % 97).cast("string"),
        F.lit(".example/p/"),
        c.cast("string"),
    )


def synthesize_pages(graph: Graph, filler_words: int = 12) -> DataFrame:
    """pages table from a graph: page u's html embeds one <a href> per
    out-neighbor. ``text`` is the expected extraction output (generated with
    the same pure function). All columns are pure functions of (node,
    neighbor list) — partitioning-independent."""
    spark = graph.edges.sparkSession
    out = graph.sym().select("src", "dst")
    adj = out.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    nodes = graph.nodes().join(
        adj.withColumnRenamed("src", "node"), "node", "left"
    ).select("node", F.coalesce("nbrs", F.array().cast("array<long>")).alias("nbrs"))

    filler = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(filler_words)),
            lambda i: F.concat(
                F.lit("w"), (F.abs(F.xxhash64(F.col("node"), i)) % 1000).cast("string")
            ),
        ),
    )
    anchors = F.concat_ws(
        "",
        F.transform(
            F.col("nbrs"),
            lambda v: F.concat(
                F.lit('<a href="'),
                url_of(v),
                F.lit('">anchor'),
                v.cast("string"),
                F.lit("</a>"),
            ),
        ),
    )
    html_str = F.concat(
        F.lit("<html><head><title>t"),
        F.col("node").cast("string"),
        F.lit("</title></head><body><p>"),
        filler,
        anchors,
        F.lit("</p></body></html>"),
    )
    anchor_texts = F.concat_ws(
        " ", F.transform(F.col("nbrs"), lambda v: F.concat(F.lit("anchor"), v.cast("string")))
    )
    expected_text = F.trim(
        F.concat(
            F.lit("t"), F.col("node").cast("string"), F.lit(" "), filler,
            F.when(F.size("nbrs") > 0, F.concat(F.lit(" "), anchor_texts)).otherwise(F.lit("")),
        )
    )
    return nodes.select(
        url_of("node").alias("url"),
        (F.lit(_EPOCH).cast("timestamp") + F.make_interval(secs=F.col("node").cast("double"))).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        expected_text.alias("text"),
        F.when(F.col("node") % 17 == 0, "de").otherwise("en").alias("lang"),
    )


def assign_node_ids(
    pages: DataFrame, cache_handle: "list | None" = None
) -> DataFrame:
    """Dense 0-based ids by sorted url (Globals.h:23 dense-id requirement;
    deterministic, partitioning-independent). Distributed: range-partition by
    url, per-partition row_number, cumulative partition offsets
    (plans/order.py) — no single-task global sort; at 10^12 rows each task
    sorts only its url range and the driver sees one row per partition.
    The range-partitioned url frame stays persisted while the mapping is
    alive (it pins the sampled boundaries AND serves the two downstream
    joins); pass ``cache_handle`` to receive it for unpersisting once the
    edge build is consumed."""
    return zip_with_index(
        pages.select("url").distinct(),
        ["url"],
        index_col="node",
        cache_handle=cache_handle,
    ).select("url", F.col("node").cast("long").alias("node"))


def pages_to_edges(pages: DataFrame, id_map: DataFrame | None = None) -> DataFrame:
    """href extraction → (src, dst, weight 1.0) over dense ids. Hrefs that
    point outside the corpus are dropped (inner join on the id map)."""
    if id_map is None:
        id_map = assign_node_ids(pages)
    hrefs = pages.select(
        "url", F.explode(extract_hrefs_udf(F.col("html"))).alias("href")
    )
    src_ids = id_map.withColumnRenamed("node", "src")
    dst_ids = id_map.select(
        F.col("url").alias("href"), F.col("node").alias("dst")
    )
    return (
        hrefs.join(src_ids, "url")
        .join(dst_ids, "href")
        .select("src", "dst", F.lit(1.0).alias("weight"))
        .distinct()
    )


def extract_and_verify(pages: DataFrame) -> DataFrame:
    """(url, ok): does pandas-UDF extraction reproduce the stored text
    byte-identically (input_hint per-row invariant)?"""
    return pages.select(
        "url",
        (
            F.sha2(F.encode(extract_text_udf(F.col("html")), "UTF-8"), 256)
            == F.sha2(F.encode(F.col("text"), "UTF-8"), 256)
        ).alias("ok"),
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages table from either an Iceberg/catalog table identifier
    or a parquet path — the BASELINE.json input_hint source.

    Dispatch: a source containing a path separator or ending in ``.parquet``
    reads as parquet; anything else resolves through the session catalog
    (``spark.table``), which is where an Iceberg catalog table
    (``spark.sql.catalog.<name>`` configured with the Iceberg runtime jars)
    appears. The sandbox ships no Iceberg jars, so production configuration
    is documented here rather than exercised::

        spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...\
          --conf spark.sql.catalog.cc=org.apache.iceberg.spark.SparkCatalog \
          --conf spark.sql.catalog.cc.type=rest ...
        read_pages(spark, "cc.web.pages")   # snapshot isolation, hidden
                                            # partitioning (days(warc_ts)),
                                            # scan planning by manifest

    Either way the result is schema-checked against the input_hint contract
    so downstream extraction never sees a drifted table.
    """
    if "/" in source or source.endswith(".parquet"):
        pages = spark.read.parquet(source)
    else:
        pages = spark.table(source)
    want = {f.strip().split(" ")[0] for f in PAGES_SCHEMA.split(",")}
    have = set(pages.columns)
    missing = want - have
    if missing:
        raise ValueError(
            f"pages source {source!r} is missing input_hint columns: "
            f"{sorted(missing)} (schema contract: {PAGES_SCHEMA})"
        )
    return pages.select("url", "warc_ts", "html", "text", "lang")
