"""Maximal-clique enumeration and maximum clique — distributed
Bron–Kerbosch over ordered neighborhoods.

Reference: /root/reference/networkit/cpp/clique/MaxClique.cpp:18-87 (exact
maximum clique by sequential branch-and-bound). The Spark engine instead
ENUMERATES all maximal cliques with the Eppstein–Löffler–Strash scheme
(arXiv:1006.5440): under a total vertex order, every maximal clique is
reported exactly once — at its minimum member v — by running pivoted
Bron–Kerbosch on v's neighborhood with candidates P = later neighbors and
excluded X = earlier neighbors. The maximum clique (MaxClique.cpp's output)
is then a one-line agg over the enumeration.

Spark plan (all heavy lifting relational, Python only inside Arrow batches):
1. order vertices by (degree, id) — the same orientation the triangle
   operators use (triangles.py:27-41): hubs sort last, so candidate sets P
   at low-order vertices stay O(arboricity)-sized on power-law graphs;
2. the induced adjacency inside N(v) is exactly the set of triangles through
   v (pair (a, b) adjacent with both in N(v) ⇔ triangle {v, a, b}), so one
   degree-ordered triangle enumeration (3T rows total) materializes every
   per-vertex subgraph — no neighborhood self-join blow-up;
3. group by v: neighbor list (with later/earlier flags) + induced pair list
   → one Arrow batch row per vertex → pivoted Bron–Kerbosch per row inside
   ``mapInPandas`` (vectorized transfer, per-vertex work bounded by
   O(d·3^(d/3)) on the ordered neighborhood).

At 100 TB the only shuffles are the degree join, the triangle wedge join
(arboricity-bounded), and one groupBy v — the same cost profile as
triangle counting, which the scaling bench already validates.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StructField, StructType,
)

from ..graph import Graph
from .triangles import triangles

_CLIQUE_SCHEMA = StructType([
    StructField("clique", ArrayType(LongType()), False),
    StructField("size", IntegerType(), False),
])


def _bron_kerbosch(v: int, later, earlier, pairs) -> list[list[int]]:
    """Pivoted BK on N(v): R starts at {v}, P = later, X = earlier; the
    induced adjacency over P ∪ X comes from ``pairs`` (triangles through v).
    Returns every clique maximal in G that has v as its order-minimum."""
    adj: dict[int, set[int]] = {u: set() for u in later}
    for u in earlier:
        adj[u] = set()
    for a, b in pairs:
        if a in adj and b in adj:
            adj[a].add(b)
            adj[b].add(a)
    out: list[list[int]] = []

    def bk(r: list[int], p: set[int], x: set[int]) -> None:
        if not p and not x:
            out.append(sorted(r))
            return
        pivot = max(p | x, key=lambda w: (len(adj[w] & p), -w))
        for u in sorted(p - adj[pivot]):
            bk(r + [u], p & adj[u], x & adj[u])
            p.remove(u)
            x.add(u)

    bk([v], set(later), set(earlier))
    return out


def maximal_cliques(graph: Graph) -> DataFrame:
    """All maximal cliques, one row each: (clique array<long> sorted by id,
    size). Isolated vertices yield size-1 cliques; triangle-free edges yield
    size-2 cliques — exactly the maximal-clique set of the undirected graph.
    """
    deg = graph.degrees()
    sym = graph.sym().select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    # neighbor lists with the later/earlier split under (degree, id) order
    e = (
        sym.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "ds"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dd"), "dst")
        .select(
            F.col("src").alias("v"),
            F.col("dst").alias("u"),
            (
                (F.col("dd") > F.col("ds"))
                | ((F.col("dd") == F.col("ds")) & (F.col("dst") > F.col("src")))
            ).alias("later"),
        )
    )
    nbrs = e.groupBy("v").agg(
        F.collect_list(F.when(F.col("later"), F.col("u"))).alias("later"),
        F.collect_list(F.when(~F.col("later"), F.col("u"))).alias("earlier"),
    )
    # induced adjacency per neighborhood: each triangle (a,b,c) contributes
    # the pair of the other two to each member's neighborhood subgraph
    tri = triangles(graph)
    tri_pairs = (
        tri.select(F.col("a").alias("v"), F.col("b").alias("x"), F.col("c").alias("y"))
        .unionAll(tri.select(F.col("b").alias("v"), F.col("a").alias("x"), F.col("c").alias("y")))
        .unionAll(tri.select(F.col("c").alias("v"), F.col("a").alias("x"), F.col("b").alias("y")))
    )
    pairs = tri_pairs.groupBy("v").agg(
        F.collect_list(F.struct("x", "y")).alias("pairs")
    )
    per_v = (
        graph.nodes().withColumnRenamed("node", "v")
        .join(nbrs, "v", "left")
        .join(pairs, "v", "left")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cliques: list[list[int]] = []
            for row in pdf.itertuples(index=False):
                later = [int(x) for x in row.later] if row.later is not None else []
                earlier = [int(x) for x in row.earlier] if row.earlier is not None else []
                prs = (
                    [(int(p["x"]), int(p["y"])) for p in row.pairs]
                    if row.pairs is not None
                    else []
                )
                cliques.extend(_bron_kerbosch(int(row.v), later, earlier, prs))
            yield pd.DataFrame(
                {
                    "clique": pd.Series(cliques, dtype=object),
                    "size": pd.Series([len(c) for c in cliques], dtype="int32"),
                }
            )

    return per_v.mapInPandas(run, schema=_CLIQUE_SCHEMA)


def clique_number(graph: Graph) -> int:
    """ω(G) — size of the maximum clique (MaxClique.cpp:73-87 ``run`` output
    ``maxi``)."""
    row = maximal_cliques(graph).agg(F.max("size").alias("w")).collect()[0]
    return int(row["w"] or 0)


def max_clique(graph: Graph) -> DataFrame:
    """One maximum clique per row (all cliques attaining ω(G)), deterministic
    order by member ids. The clique enumeration is materialized eagerly (it
    feeds both the ω aggregation and the filter) and its storage released
    once the small ω-sized result is pinned — a bare persist here leaked
    the full enumeration per call."""
    from ..plans.ckpt import clean_local_checkpoint as _cc
    from ..plans.iterate import _free_checkpoint_blocks

    mc = _cc(maximal_cliques(graph))
    w = mc.agg(F.max("size")).collect()[0][0]
    out = mc.filter(F.col("size") == w).orderBy(F.col("clique")).localCheckpoint(
        eager=True
    )
    _free_checkpoint_blocks(mc)
    return out
