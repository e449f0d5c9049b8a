#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: compare_oracle.py [sfDir] [verifyOutDir]

Reads each SparkEntry query's parquet dump (written by `graft.Verify`),
runs the matching oracle SQL in DuckDB over the same source tables,
sorts columns by name and rows by all columns, and compares values
exactly. Mirrors the driver's sort-columns-then-hash compare so oracle
mismatches are caught before the round runs.
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

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


def container_check(name: str, out_dir: str, rel) -> str:
    """Reject container-typed (list/struct/map) output columns on EITHER side.

    Round-12 lesson (q257): the DRIVER sorts raw cells before stringifying,
    and a list/struct cell is unsortable in pandas ('unhashable type:
    numpy.ndarray') — while this tool's `canon` stringifies FIRST, so a
    container column passed locally and errored at the gate. Reproduce the
    driver's failure mode loudly instead: no gated query may emit a
    container column; render with to_json(...) or explode to scalar rows.
    Returns an error string, or "" if clean.
    """
    import pyarrow as pa
    for f in sorted(glob.glob(f"{out_dir}/{name}/*.parquet")):
        for fld in pq.read_schema(f):
            if pa.types.is_nested(fld.type):
                return (f"container-typed engine column {fld.name} "
                        f"({fld.type}) in {f} — the driver sorts raw cells "
                        f"and cannot sort array/struct/map (r12 q257); "
                        f"to_json(...) it or explode to scalar rows")
    for c, t in zip(rel.columns, rel.types):
        ts = str(t)
        if ts.endswith("[]") or ts.split("(")[0] in ("STRUCT", "MAP", "LIST", "UNION"):
            return (f"container-typed oracle column {c} ({ts}) — the driver "
                    f"sorts raw cells and cannot sort array/struct/map "
                    f"(r12 q257); render it scalar in the oracle SQL")
    return ""


def decimal_cols(schema) -> dict:
    """name -> (precision, scale) for every decimal column in an arrow schema."""
    import pyarrow as pa
    out = {}
    for f in schema:
        if pa.types.is_decimal(f.type):
            out[f.name] = (f.type.precision, f.type.scale)
    return out


def type_drift(name: str, out_dir: str, rel) -> str:
    """Detect decimal-vs-double drift that pandas `.df()` coercion masks.

    Round-10 lesson (q104): the engine emitted decimal(27,6) where the
    oracle's DuckDB `/ 100.0` is DOUBLE. Values matched, but the driver
    hashes stringified values ("52840.440000" vs "52840.44") so the row
    was red — while this tool's `.df()` read coerced the engine decimal
    to float64 BEFORE astype(str) and printed PASS. Compare arrow-level
    decimal-ness (and scale) on both sides before any pandas coercion:
    a column that is decimal on exactly one side, or decimal with a
    different scale, stringifies differently under the driver's hash.
    Returns an error string, or "" if clean.
    """
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return ""
    # Union decimal columns across ALL files of the dump (ADVICE r11):
    # reading only files[0] would pass a multi-file dump whose later
    # parts carry a drifted decimal schema. Footer reads are cheap, and
    # per-file disagreement on a column's decimal-ness/scale is itself
    # drift (the driver hashes every file's stringified rows).
    eng = decimal_cols(pq.read_schema(files[0]))
    for f in files[1:]:
        other = decimal_cols(pq.read_schema(f))
        for c in set(eng) | set(other):
            # None-vs-(p,s) means the column is decimal in one part and
            # not the other — per-file disagreement IS drift (the driver
            # hashes every file's stringified rows), and unioning it
            # away would let the decimal side mask the double side.
            if eng.get(c) != other.get(c):
                def d(v):
                    return f"decimal{v}" if v else "not decimal"
                return (f"type drift: column {c} is {d(eng.get(c))} in "
                        f"{files[0]} but {d(other.get(c))} in {f}")
    # rel.types is the bound schema — no re-execution of the oracle SQL.
    ora = {}
    for c, t in zip(rel.columns, rel.types):
        ts = str(t)
        if ts.startswith("DECIMAL"):
            p, sc = ts[ts.index("(") + 1:ts.index(")")].split(",")
            ora[c] = (int(p), int(sc))
    for c in sorted(set(eng) | set(ora)):
        if c in eng and c not in ora:
            return (f"type drift: engine column {c} is decimal{eng[c]} "
                    f"but oracle is not decimal")
        if c in ora and c not in eng:
            return (f"type drift: oracle column {c} is decimal{ora[c]} "
                    f"but engine is not decimal")
        if eng[c][1] != ora[c][1]:
            return (f"type drift: column {c} decimal scale "
                    f"{eng[c][1]} (engine) vs {ora[c][1]} (oracle)")
    return ""


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
            rel = con.sql(oracle[name])
            drift = container_check(name, out, rel) or type_drift(name, out, rel)
            want = rel.df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            fails.append(name)
            continue
        if drift:
            print(f"FAIL {name}: {drift}")
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
