"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB at a given SF, compare row count / column names / order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            df[c] = col.round(9).map(lambda v: f"{v:.9g}")
        elif col.dtype.kind in "iu":
            df[c] = col.map(str)
        else:
            df[c] = col.map(lambda v: str(v))
    rows = sorted("\x01".join(r) for r in df.astype(str).itertuples(index=False))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def dtype_split(sdf: pd.DataFrame, odf: pd.DataFrame) -> list:
    """Columns where one engine yields an integer dtype and the other a float
    (or object) dtype. ``canon``'s ``%.9g`` float path renders ``124750.0``
    and int64 ``124750`` identically, which masks exactly the mismatch the
    driver's stricter hasher flags (e.g. DuckDB typing ``SUM(BIGINT)`` as
    HUGEINT → pandas float64 vs Spark int64 — round-4 gate-red doc_split).
    Treat such a split as a failure so this tool predicts the driver rather
    than being more lenient than it."""
    out = []
    for c in set(sdf.columns) & set(odf.columns):
        ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
        if ("iu".find(ks) >= 0) != ("iu".find(ko) >= 0):
            out.append(f"{c}(spark:{sdf[c].dtype},oracle:{odf[c].dtype})")
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from networkit_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("check-oracles", cpus=8, shuffle_partitions=16)
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) rows={len(sdf)} [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and canon(sdf) == canon(odf)
        splits = dtype_split(sdf, odf) if ok_cols else []
        ok = ok_rows and ok_cols and ok_hash and not splits
        status = "OK  " if ok else "FAIL"
        print(
            f"{status} {name}: rows {len(sdf)}/{len(odf)} cols={ok_cols} "
            f"hash={'match' if ok_hash else 'MISMATCH'} "
            + (f"DTYPE-SPLIT {splits} " if splits else "")
            + f"[spark {t_spark:.1f}s duck {t_duck:.1f}s]"
        )
        if not ok:
            failures.append(name)
            if ok_rows and ok_cols:
                # show a few differing rows for debugging
                s = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
                o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
                for i in range(min(len(s), len(o))):
                    if not s.iloc[i].equals(o.iloc[i]):
                        print(f"   first diff row {i}:\n    spark: {s.iloc[i].to_dict()}\n    duck : {o.iloc[i].to_dict()}")
                        break
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
