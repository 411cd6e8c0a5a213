"""Fixed-unroll oracle convergence margins (ADVICE round 1).

Several DuckDB oracles unroll a fixpoint algorithm a FIXED number of rounds
(chained CTEs) while the Spark side runs to convergence.  If a data or
scale change ever needed more rounds than the unroll, the oracle would be
silently wrong and the driver gate would report a bogus mismatch (or worse,
a bogus match against a wrong Spark result).  This test re-generates each
such oracle with ONE extra round and asserts the result is identical —
i.e. every unroll depth has at least one spare round of margin at the
gate's scale factor.

Pure DuckDB — no Spark session, runs in seconds.
"""

import duckdb
import pytest

import __spark_entry__ as e

SF_DIR = "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# (query name, module constant holding the unroll depth)
UNROLLED = [
    ("bfs_dist", "BFS_ROUNDS"),
    ("sssp_dist", "SSSP_ROUNDS"),
    ("connected_components", "CC_ROUNDS"),
    ("kcore", "KCORE_ROUNDS"),
    ("closeness", "CL_ROUNDS"),
    ("diameter_range", "DIAM_ROUNDS"),
    ("diameter_exact", "DIAM_EXACT_ROUNDS"),
    ("coreness", "CORE_HINDEX_ROUNDS"),
    ("betweenness", "BW_ROUNDS"),
    ("matching", "MATCH_ROUNDS"),
    ("path_growing", "PG_ROUNDS"),
    ("path_growing", "PG_COLOR_DEPTH"),
    ("luby_mis", "LUBY_ROUNDS"),
    ("spanning_forest", "SF_OUT_ROUNDS"),
    ("top_closeness", "TOPC_DOUBLINGS"),
    ("dynbfs_update", "DYN_ROUNDS"),
    ("dedup_clusters", "DEDUP_CLUSTER_ROUNDS"),
    ("umsf", "UMSF_ROUNDS"),
    ("ktruss", "TRUSS_ROUNDS"),
    ("scc", "CLOSURE_DOUBLINGS"),
    ("bowtie", "CLOSURE_DOUBLINGS"),
    ("dynpagerank_update", "DYNPR_ROUNDS"),
    ("harmonic", "CL_ROUNDS"),
    ("edge_betweenness", "BW_ROUNDS"),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _run(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(r[i] for i in order) for r in rows)


@pytest.mark.parametrize("name,const", UNROLLED)
def test_one_extra_round_is_identical(con, name, const, monkeypatch):
    base_sql = e.oracle_sql()[name]
    monkeypatch.setattr(e, const, getattr(e, const) + 1)
    deeper_sql = e.oracle_sql()[name]
    assert deeper_sql != base_sql, f"{const} does not affect {name}'s oracle"
    assert _run(con, base_sql) == _run(con, deeper_sql), (
        f"oracle {name} has NOT converged at {const}={getattr(e, const) - 1}: "
        f"one more unroll round changes the result"
    )
