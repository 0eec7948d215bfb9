"""Driver-hash simulator — stricter than tools/oracle_check.py.

The per-round driver compares Spark vs DuckDB by canonicalizing BOTH results
through pandas (sort columns by name, lexicographic row sort, stringify every
cell) and hashing the result. That makes it sensitive to *representation*:
Spark decimal(38,2) -> Decimal('1.20') vs DuckDB HUGEINT -> 1.2 float64 is a
hash MISMATCH even when the values are equal, and list-typed cells crash the
pandas sort outright (round-1's two `err` rows).

This tool reproduces that exact failure mode locally: run a query both ways,
push both frames through the same canonicalizer, and diff the canonical string
rows. A query green here should be hash-green in CORRECTNESS_r{N}.json.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from tools.oracle_check import TABLES, duck_con  # noqa: E402


def canon(df: pd.DataFrame) -> list[str]:
    """Mimic the driver's _canon: column-name sort, full row sort, stringify.

    Crashes (like the driver) on unhashable cells such as lists — that is the
    point: catch those locally.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return ["|".join(_cell(v) for v in row) for row in df.itertuples(index=False)]


def _cell(v) -> str:
    # The driver stringifies whatever pandas handed it; dtype differences
    # (Decimal vs float64, int64 vs float64) therefore CHANGE the string.
    # Exception, observed empirically from CORRECTNESS_r01: date-typed vs
    # timestamp-typed temporals DID hash equal (date_functions_orders emits
    # a raw DATE and was driver-green), so the driver normalizes temporals —
    # mirror that by canonicalizing every date/datetime to one form.
    if v is None or v != v:  # NaN-safe
        return "NULL"
    import datetime

    if isinstance(v, (pd.Timestamp, datetime.date, datetime.datetime)):
        return str(pd.Timestamp(v))
    return str(v)


def digest(rows: list[str]) -> str:
    h = hashlib.sha256()
    for r in sorted(rows):
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def check(
    name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, dict]:
    spdf = spark_df.toPandas()
    ddf = con.sql(sql).df()
    rec = {
        "rows_match": len(spdf) == len(ddf),
        "schema_match": sorted(spdf.columns) == sorted(ddf.columns),
        "hash_match": False,
        "spark_rows": len(spdf),
        "oracle_rows": len(ddf),
        "err": None,
    }
    ok = True
    if not rec["schema_match"]:
        print(f"  [{name}] SCHEMA: spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}")
        ok = False
    if not rec["rows_match"]:
        print(f"  [{name}] ROWS: spark={len(spdf)} duck={len(ddf)}")
        ok = False
    try:
        srows, drows = canon(spdf), canon(ddf)
    except TypeError as e:
        print(f"  [{name}] CANON CRASH (driver would record err): {e}")
        rec["err"] = f"canon crash: {e}"
        return False, rec
    rec["hash_match"] = digest(srows) == digest(drows)
    if not rec["hash_match"]:
        sset, dset = set(srows), set(drows)
        print(f"  [{name}] HASH mismatch")
        for r in list(sset - dset)[:3]:
            print(f"    spark: {r}")
        for r in list(dset - sset)[:3]:
            print(f"    duck : {r}")
        ok = False
    print(f"  [{name}] {'OK' if ok else 'FAIL'} ({len(spdf)} rows)")
    return ok, rec


def main() -> int:
    # --json PATH writes the full per-query snapshot in the driver's
    # CORRECTNESS_r{N}.json record format (ADVICE r2: back the "all 152
    # hash-green" claim with a committed artifact)
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from cdc_rs_spark.registry import load_all
    from cdc_rs_spark.session import get_spark

    registry = load_all()
    spark = get_spark("driver-sim")
    con = duck_con(sf_dir)

    failures, n_run = [], 0
    records: dict[str, dict] = {}
    for name, q in registry.items():
        if only and name not in only:
            continue
        n_run += 1
        if q.oracle is None:
            n = q.fn(spark, sf_dir).count()
            records[name] = {"rows_only": True, "spark_rows": n, "err": None}
            print(f"  [{name}] rows-only: {n} rows")
            continue
        try:
            ok, rec = check(name, q.fn(spark, sf_dir), con, q.oracle)
            records[name] = rec
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"  [{name}] ERROR: {e}")
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": str(e)[:300],
            }
            failures.append(name)
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(records, f, indent=1, sort_keys=True)
        print(f"snapshot -> {json_out}")
    print(f"\n{n_run - len(failures)}/{n_run} hash-OK")
    if failures:
        print("FAILED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
