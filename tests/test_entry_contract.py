"""Driver-contract shape checks (cheap: no SparkSession).

The heavyweight Spark-vs-DuckDB value parity over EVERY ``queries()`` entry
is committed in-repo as ``tests/test_oracle_parity.py`` (sf0.001, one pytest
per query); ``tools/check_oracles.py`` remains the standalone runner for
larger SFs. Here we pin the contract invariants that would break the
driver: key alignment, SQL validity, and oracle column naming.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"

ROWS_ONLY = {
    # the only ops left without a SQL oracle (both seeded-float estimators
    # whose libm-dependent outputs can't hash-match across engines; the
    # underlying machinery is hard-verified by anf_nf and modularity_plp)
    "anf_diameter", "plm",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_has_a_query():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)


def test_rows_only_set_is_exactly_the_oracle_gap():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(qs) - set(os_) == ROWS_ONLY


def test_all_oracles_parse_and_run(con):
    for name, sql in entry.oracle_sql().items():
        df = con.execute(sql).df()
        assert len(df.columns) > 0, name
        # driver compares columns sorted by name — no duplicate names allowed
        assert len(set(df.columns)) == len(df.columns), name


def test_queries_are_callables():
    for name, fn in entry.queries().items():
        assert callable(fn), name
