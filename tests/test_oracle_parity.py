"""Full-contract parity: EVERY ``__spark_entry__.queries()`` entry runs on
Spark AND its ``oracle_sql()`` twin on DuckDB at sf0.001, comparing row
count, column names, and the order-insensitive canonical value hash — the
exact comparison the driver gate applies at sf0.01, committed in-repo so the
hard signal is reproducible with plain ``pytest`` (round-2 verdict item #1).

Reuses :mod:`tools.check_oracles` (``canon``, ``TABLES``) verbatim so this
test and the standalone runner can never drift apart. Queries without an
oracle (rows-only contract entries) are asserted to execute cleanly.

One pytest per query: a single mismatch names its query instead of failing a
monolithic loop.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from tools.check_oracles import TABLES, canon, dtype_split

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entry.queries()
_ORACLES = entry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        # rows-only contract entry: must execute cleanly with a stable schema
        assert len(sdf.columns) > 0
        return
    odf = duck.execute(_ORACLES[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols {sorted(sdf.columns)} != {sorted(odf.columns)}"
    )
    assert canon(sdf) == canon(odf), f"{name}: value hash mismatch"
    splits = dtype_split(sdf, odf)
    assert not splits, f"{name}: int/float dtype split {splits}"
