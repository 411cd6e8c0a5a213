"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operators (SURVEY.md §2) over a
deterministic graph derived from the shared ``lineitem`` table
(networkit_spark/testgraph.py); ``oracle_sql()`` regenerates the same
computation as ANSI SQL for DuckDB, unrolling iterative algorithms to a fixed
superstep count. Fixed-iteration queries run the SAME count in Spark;
fixpoint queries (components, k-core, BFS) over-unroll the oracle past
convergence, which is checked in tests/test_entry_oracles.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import Graph
from networkit_spark.testgraph import edges_sql, lineitem_edges, lineitem_graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.community import coarsen, plp
from networkit_spark.operators.kcore import k_core
from networkit_spark.operators.distance import bfs_distances
from networkit_spark.operators.triangles import (
    local_clustering_coefficient,
    node_triangle_counts,
    triangles,
)

# iteration counts shared between Spark queries and SQL oracles
PR_ITERS = 20
PLP_ITERS = 4
CC_ROUNDS = 20   # oracle unroll; Spark runs to fixpoint (converges ≪ 20)
KCORE_ROUNDS = 15
KCORE_K = 90  # min degree is 79, ~4 nodes peel at 90 → non-trivial stable core
BFS_ROUNDS = 10
N_NODES = 1000


# ---------------------------------------------------------------------------
# entry: flagship query (driver smoke check at sf0.001)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """PageRank of the lineitem-derived link graph at sf0.001."""
    g = lineitem_graph(spark, "/root/testdata/sf0.001", n_nodes=500)
    pr = pagerank(g, damp=0.85, fixed_iters=PR_ITERS)
    return pr.select("node", F.round("score", 6).alias("score")).orderBy(
        F.desc("score"), F.asc("node")
    )


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

def _g(spark, sf_dir, directed=False):
    return lineitem_graph(spark, sf_dir, n_nodes=N_NODES, directed=directed)


def q_edges(spark, sf_dir):
    return lineitem_edges(spark, sf_dir, n_nodes=N_NODES)


def q_degree(spark, sf_dir):
    return _g(spark, sf_dir).degrees()


def q_wdeg(spark, sf_dir):
    return _g(spark, sf_dir).weighted_degrees()


def q_pagerank(spark, sf_dir):
    pr = pagerank(_g(spark, sf_dir), damp=0.85, fixed_iters=PR_ITERS)
    return pr.select("node", F.round("score", 6).alias("score"))


def q_pagerank_directed(spark, sf_dir):
    pr = pagerank(_g(spark, sf_dir, directed=True), damp=0.85, fixed_iters=PR_ITERS)
    return pr.select("node", F.round("score", 6).alias("score"))


def q_components(spark, sf_dir):
    return connected_components(_g(spark, sf_dir))


def q_plp(spark, sf_dir):
    return plp(_g(spark, sf_dir), fixed_iters=PLP_ITERS)


def q_triangle_count(spark, sf_dir):
    return triangles(_g(spark, sf_dir)).agg(F.count("*").alias("triangles"))


def q_triangles_per_node(spark, sf_dir):
    return node_triangle_counts(_g(spark, sf_dir)).select(
        "node", F.col("triangles").cast("long").alias("triangles")
    )


def q_lcc(spark, sf_dir):
    return local_clustering_coefficient(_g(spark, sf_dir)).select(
        "node", F.round("lcc", 6).alias("lcc")
    )


def q_modularity_plp(spark, sf_dir):
    g = _g(spark, sf_dir)
    labels = plp(g, fixed_iters=PLP_ITERS)
    m = g.edges.agg(F.sum("weight")).collect()[0][0]
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    el = g.edges.join(la, "src").join(lb, "dst")
    intra = (
        el.filter(F.col("lsrc") == F.col("ldst")).agg(F.sum("weight")).collect()[0][0]
        or 0.0
    )
    vol = (
        labels.join(g.weighted_degrees(), "node")
        .groupBy("label")
        .agg(F.sum("wdeg").alias("vol"))
    )
    return vol.agg(
        F.round(
            F.lit(intra / m) - F.sum(F.pow(F.col("vol") / F.lit(2.0 * m), 2)), 6
        ).alias("modularity")
    )


def q_coarsen_plp(spark, sf_dir):
    g = _g(spark, sf_dir)
    labels = plp(g, fixed_iters=PLP_ITERS)
    return coarsen(g, labels).edges


def q_assortativity(spark, sf_dir):
    g = _g(spark, sf_dir)
    deg = g.degrees()
    d1 = deg.select(F.col("node").alias("src"), F.col("degree").alias("dsrc"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("degree").alias("ddst"))
    pairs = g.sym().join(d1, "src").join(d2, "dst")
    return pairs.agg(
        F.round(
            F.corr(F.col("dsrc").cast("double"), F.col("ddst").cast("double")), 6
        ).alias("assortativity")
    )


def q_kcore(spark, sf_dir):
    return k_core(_g(spark, sf_dir), k=KCORE_K)


def q_bfs(spark, sf_dir):
    g = _g(spark, sf_dir)
    source = g.nodes().agg(F.min("node")).collect()[0][0]
    return bfs_distances(g, int(source)).select(
        "node", F.col("dist").cast("long").alias("dist")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_edges": q_edges,
        "graph_degree": q_degree,
        "graph_wdeg": q_wdeg,
        "pagerank": q_pagerank,
        "pagerank_directed": q_pagerank_directed,
        "connected_components": q_components,
        "plp": q_plp,
        "triangle_count": q_triangle_count,
        "triangles_per_node": q_triangles_per_node,
        "lcc": q_lcc,
        "modularity_plp": q_modularity_plp,
        "coarsen_plp": q_coarsen_plp,
        "assortativity": q_assortativity,
        "kcore": q_kcore,
        "bfs_dist": q_bfs,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL — same derivation, iterations unrolled
# ---------------------------------------------------------------------------

def _with(*ctes: str, select: str) -> str:
    return "WITH " + ",\n".join(c.strip().rstrip(",") for c in ctes) + "\n" + select


def _pr_ctes(iters: int, directed: bool) -> list[str]:
    ctes = [
        edges_sql(N_NODES, directed=directed),
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes)",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS score FROM nodes CROSS JOIN nn)",
    ]
    for i in range(iters):
        ctes.append(f"""r{i + 1} AS MATERIALIZED (
  SELECT nd.node, 0.85 * COALESCE(m.mass, 0) + 0.15 / nn.n AS score
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT t.dst AS node, SUM(t.weight / w.wdeg * r.score) AS mass
    FROM sym t JOIN wdeg w ON t.src = w.node JOIN r{i} r ON t.src = r.node
    GROUP BY t.dst
  ) m ON nd.node = m.node
)""")
    return ctes


def _pagerank_sql(directed: bool = False) -> str:
    ctes = _pr_ctes(PR_ITERS, directed)
    return _with(
        *ctes,
        select=(
            f"SELECT node, ROUND(score / (SELECT SUM(score) FROM r{PR_ITERS}), 6)"
            f" AS score FROM r{PR_ITERS}"
        ),
    )


def _cc_sql() -> str:
    ctes = [edges_sql(N_NODES), "c0 AS MATERIALIZED (SELECT node, node AS component FROM nodes)"]
    for i in range(CC_ROUNDS):
        ctes.append(f"""c{i + 1} AS MATERIALIZED (
  SELECT x.node, MIN(x.component) AS component FROM (
    SELECT node, component FROM c{i}
    UNION ALL
    SELECT s.dst AS node, c.component FROM sym s JOIN c{i} c ON s.src = c.node
  ) x GROUP BY x.node
)""")
    return _with(*ctes, select=f"SELECT node, component FROM c{CC_ROUNDS}")


def _plp_ctes(iters: int) -> list[str]:
    ctes = [edges_sql(N_NODES), "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"]
    for i in range(iters):
        ctes.append(f"""l{i + 1} AS MATERIALIZED (
  SELECT n.node, COALESCE(b.best, n.label) AS label
  FROM l{i} n LEFT JOIN (
    SELECT u, label AS best FROM (
      SELECT s.src AS u, c.label AS label,
             ROW_NUMBER() OVER (
               PARTITION BY s.src
               ORDER BY SUM(s.weight) DESC, c.label ASC
             ) AS rn
      FROM sym s JOIN l{i} c ON s.dst = c.node
      GROUP BY s.src, c.label
    ) q WHERE rn = 1
  ) b ON n.node = b.u
)""")
    return ctes


def _plp_sql() -> str:
    return _with(
        *_plp_ctes(PLP_ITERS), select=f"SELECT node, label FROM l{PLP_ITERS}"
    )


_TRI_CTES = """
ordir AS MATERIALIZED (
  SELECT s.src, s.dst FROM sym s
  JOIN deg d1 ON s.src = d1.node JOIN deg d2 ON s.dst = d2.node
  WHERE d1.degree < d2.degree OR (d1.degree = d2.degree AND s.src < s.dst)
),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ordir e1
  JOIN ordir e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN edges e3 ON e3.src = LEAST(e1.dst, e2.dst) AND e3.dst = GREATEST(e1.dst, e2.dst)
),
tpn AS MATERIALIZED (
  SELECT n.node, COALESCE(t.cnt, 0) AS triangles
  FROM nodes n LEFT JOIN (
    SELECT node, COUNT(*) AS cnt FROM (
      SELECT a AS node FROM tri
      UNION ALL SELECT b AS node FROM tri
      UNION ALL SELECT c AS node FROM tri
    ) corners GROUP BY node
  ) t ON n.node = t.node
)
"""


def _mod_sql() -> str:
    ctes = _plp_ctes(PLP_ITERS)
    L = f"l{PLP_ITERS}"
    ctes.append(f"""el AS MATERIALIZED (
  SELECT e.weight, la.label AS lsrc, lb.label AS ldst
  FROM edges e JOIN {L} la ON e.src = la.node JOIN {L} lb ON e.dst = lb.node
)""")
    ctes.append("mm AS MATERIALIZED (SELECT SUM(weight) AS m FROM edges)")
    ctes.append(
        "intra AS MATERIALIZED (SELECT COALESCE(SUM(weight), 0) AS w FROM el WHERE lsrc = ldst)"
    )
    ctes.append(f"""vol AS MATERIALIZED (
  SELECT l.label, SUM(w.wdeg) AS vol FROM {L} l JOIN wdeg w ON l.node = w.node
  GROUP BY l.label
)""")
    return _with(
        *ctes,
        select=(
            "SELECT ROUND(intra.w / mm.m - "
            "(SELECT SUM(POW(vol / (2 * mm.m), 2)) FROM vol), 6) AS modularity "
            "FROM intra, mm"
        ),
    )


def _coarsen_sql() -> str:
    ctes = _plp_ctes(PLP_ITERS)
    L = f"l{PLP_ITERS}"
    return _with(
        *ctes,
        select=(
            f"SELECT LEAST(la.label, lb.label) AS src, "
            f"GREATEST(la.label, lb.label) AS dst, SUM(e.weight) AS weight "
            f"FROM edges e JOIN {L} la ON e.src = la.node "
            f"JOIN {L} lb ON e.dst = lb.node GROUP BY 1, 2"
        ),
    )


def _kcore_sql() -> str:
    ctes = [edges_sql(N_NODES), "k0 AS MATERIALIZED (SELECT node FROM nodes)"]
    for i in range(KCORE_ROUNDS):
        ctes.append(f"""k{i + 1} AS MATERIALIZED (
  SELECT s.src AS node FROM sym s
  JOIN k{i} a ON s.src = a.node JOIN k{i} b ON s.dst = b.node
  GROUP BY s.src HAVING COUNT(*) >= {KCORE_K}
)""")
    return _with(*ctes, select=f"SELECT node FROM k{KCORE_ROUNDS}")


def _bfs_sql() -> str:
    ctes = [
        edges_sql(N_NODES),
        "b0 AS MATERIALIZED (SELECT MIN(node) AS node, 0 AS dist FROM nodes)",
    ]
    for i in range(BFS_ROUNDS):
        ctes.append(f"""b{i + 1} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM b{i}
    UNION ALL
    SELECT s.dst AS node, c.dist + 1 AS dist FROM sym s JOIN b{i} c ON s.src = c.node
  ) x GROUP BY node
)""")
    return _with(
        *ctes,
        select=f"SELECT node, CAST(dist AS BIGINT) AS dist FROM b{BFS_ROUNDS}",
    )


def oracle_sql() -> dict[str, str]:
    E = edges_sql(N_NODES)
    return {
        "graph_edges": _with(E, select="SELECT src, dst, weight FROM edges"),
        "graph_degree": _with(
            E,
            select=(
                "SELECT n.node, COALESCE(d.degree, 0) AS degree "
                "FROM nodes n LEFT JOIN deg d ON n.node = d.node"
            ),
        ),
        "graph_wdeg": _with(
            E,
            select=(
                "SELECT n.node, COALESCE(w.wdeg, 0) AS wdeg "
                "FROM nodes n LEFT JOIN wdeg w ON n.node = w.node"
            ),
        ),
        "pagerank": _pagerank_sql(directed=False),
        "pagerank_directed": _pagerank_sql(directed=True),
        "connected_components": _cc_sql(),
        "plp": _plp_sql(),
        "triangle_count": _with(
            E, _TRI_CTES, select="SELECT COUNT(*) AS triangles FROM tri"
        ),
        "triangles_per_node": _with(
            E, _TRI_CTES, select="SELECT node, triangles FROM tpn"
        ),
        "lcc": _with(
            E,
            _TRI_CTES,
            select=(
                "SELECT t.node, ROUND(CASE WHEN d.degree >= 2 "
                "THEN 2.0 * t.triangles / (d.degree * (d.degree - 1)) "
                "ELSE 0 END, 6) AS lcc "
                "FROM tpn t JOIN deg d ON t.node = d.node"
            ),
        ),
        "modularity_plp": _mod_sql(),
        "coarsen_plp": _coarsen_sql(),
        "assortativity": _with(
            E,
            select=(
                "SELECT ROUND(CORR(CAST(d1.degree AS DOUBLE), "
                "CAST(d2.degree AS DOUBLE)), 6) AS assortativity "
                "FROM sym s JOIN deg d1 ON s.src = d1.node "
                "JOIN deg d2 ON s.dst = d2.node"
            ),
        ),
        "kcore": _kcore_sql(),
        "bfs_dist": _bfs_sql(),
    }
