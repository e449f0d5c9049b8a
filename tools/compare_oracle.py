#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: compare_oracle.py [sfDir] [verifyOutDir]

Reads each SparkEntry query's parquet dump (written by `graft.Verify`),
runs the matching oracle SQL in DuckDB over the same source tables,
sorts columns by name and rows by all columns, and compares values
exactly. Mirrors the driver's sort-columns-then-hash compare so oracle
mismatches are caught before the round runs.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Stringify BEFORE sorting/comparing: the driver hashes stringified
    # values, so 12163 (int64) vs 12163.0 (HUGEINT->float64) must FAIL
    # here too, and raw array cells (unsortable in pandas) must never
    # reach a sort. Round-3 lessons: q29 (SUM int -> HUGEINT) and q56
    # (list column) both passed a numeric-tolerant local compare while
    # failing the driver.
    df = df[sorted(df.columns)].astype(str)
    if len(df) == 0:
        return df.reset_index(drop=True)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.verify-out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    fails = []
    for name in sorted(oracle):
        try:
            got = con.sql(f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')").df()
            want = con.sql(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            fails.append(name)
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            fails.append(name)
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            fails.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:400]}")
            fails.append(name)
    print(f"{len(oracle) - len(fails)}/{len(oracle)} oracled queries pass")
    extra = set()
    try:
        import os
        extra = {d for d in os.listdir(out)
                 if os.path.isdir(os.path.join(out, d))} - set(oracle)
    except OSError:
        pass
    if extra:
        print(f"(rows-only, no oracle: {sorted(extra)})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
