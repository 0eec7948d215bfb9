"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value digest. Stricter than a hash: normalized row
multisets are compared directly, so any mismatch prints a concrete diff.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from collections import Counter

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical shortest repr — tolerant of f32/f64 print differences
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def row_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        "|".join(normalize(r[i]) for i in order) for r in rows
    )


def compare(name: str, spark_df, con, sql: str) -> bool:
    sres = spark_df.collect()
    scols = spark_df.columns
    srows = [tuple(r) for r in sres]
    dres = con.sql(sql)
    dcols = dres.columns
    drows = dres.fetchall()
    ok = True
    if sorted(scols) != sorted(dcols):
        print(f"  [{name}] SCHEMA mismatch: spark={sorted(scols)} duck={sorted(dcols)}")
        ok = False
    if len(srows) != len(drows):
        print(f"  [{name}] ROWCOUNT mismatch: spark={len(srows)} duck={len(drows)}")
        ok = False
    if ok:
        sm, dm = row_multiset(scols, srows), row_multiset(dcols, drows)
        if sm != dm:
            only_s = list((sm - dm).items())[:5]
            only_d = list((dm - sm).items())[:5]
            print(f"  [{name}] VALUE mismatch ({len(sm - dm)} spark-only / {len(dm - sm)} duck-only rows)")
            for r, _ in only_s:
                print(f"    spark: {r}")
            for r, _ in only_d:
                print(f"    duck : {r}")
            ok = False
    print(f"  [{name}] {'OK' if ok else 'FAIL'} ({len(srows)} rows)")
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from cdc_rs_spark.registry import load_all
    from cdc_rs_spark.session import get_spark

    registry = load_all()
    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)

    failures = []
    n_run = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        n_run += 1
        if q.oracle is None:
            n = q.fn(spark, sf_dir).count()
            print(f"  [{name}] rows-only check: {n} rows")
            continue
        try:
            if not compare(name, q.fn(spark, sf_dir), con, q.oracle):
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"  [{name}] ERROR: {e}")
            failures.append(name)
    print(f"\n{n_run - len(failures)}/{n_run} OK")
    if failures:
        print("FAILED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
