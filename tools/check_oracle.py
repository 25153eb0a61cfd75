"""Local replica of the round driver's correctness gate: run every
queries() entry at sf0.01 and compare with oracle_sql() via DuckDB —
row count, schema (column names), and order-insensitive value equality.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import os

# driver gate runs at sf0.01; override to stress-test oracles at other
# scales (e.g. SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 for the float-
# sensitive cross-engine queries)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import math as m

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if m.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (bytes, bytearray)):
        import hashlib

        return hashlib.md5(bytes(v)).hexdigest()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from rastertiler_rs_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = sys.argv[1:] or list(qs)
    failures = []
    for name in selected:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:22s} spark error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name:22s} rows-only: {len(srows)} rows, {len(scols)} cols  ({dt:.1f}s)")
            if len(srows) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name:22s} duckdb error: {e}")
            failures.append(name)
            continue
        sc, sm = df_to_multiset(scols, srows)
        dc, dm = df_to_multiset(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name:22s} schema: spark={sc} duckdb={dc}")
            failures.append(name)
            continue
        if len(sm) != len(dm):
            print(f"FAIL  {name:22s} rowcount: spark={len(sm)} duckdb={len(dm)}")
            failures.append(name)
            continue
        if sm != dm:
            diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            print(f"FAIL  {name:22s} values differ; first diffs: {diffs}")
            failures.append(name)
            continue
        print(f"ok    {name:22s} {len(sm)} rows match  ({dt:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print(f"all {len(selected)} queries consistent")


if __name__ == "__main__":
    main()
