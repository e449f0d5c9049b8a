#!/usr/bin/env python3
"""Regression test: compare_oracle.py must FAIL on decimal-vs-double drift.

Round-10 q104 class: engine dump column decimal(27,6), oracle DOUBLE,
values numerically identical. The old tool read the dump through
DuckDB's `.df()`, which coerced DECIMAL -> float64 before astype(str),
printing PASS while the driver's stringified-value hash failed
("52840.440000" vs "52840.44"). This test synthesizes exactly that
situation and asserts the hardened tool reports type drift.

Run: python3 tools/test_compare_oracle.py
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))


def write_dump(out_dir: str, name: str, table: pa.Table) -> None:
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))


def run_tool(sf_dir: str, out_dir: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(HERE, "compare_oracle.py"), sf_dir, out_dir],
        capture_output=True, text=True, check=False)


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="cmporacle-test-")
    try:
        # Minimal source table dir (the tool creates views over all TABLES;
        # parquet_scan of a missing file only errors if a query touches it,
        # so materialize each as a one-column stub).
        sf = os.path.join(tmp, "sf")
        os.makedirs(sf)
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                           os.path.join(sf, f"{t}.parquet"))

        out = os.path.join(tmp, "verify-out")
        os.makedirs(out)

        # Case 1 (must FAIL): engine decimal(27,6) vs oracle DOUBLE,
        # numerically identical values — the q104 masking class.
        write_dump(out, "q_drift", pa.table({
            "k": pa.array(["A"], pa.string()),
            "v": pa.array([Decimal("52840.440000")], pa.decimal128(27, 6)),
        }))
        # Case 2 (must PASS): both sides double, same value.
        write_dump(out, "q_clean", pa.table({
            "k": pa.array(["A"], pa.string()),
            "v": pa.array([52840.44], pa.float64()),
        }))
        # Case 3 (must FAIL): MULTI-FILE dump where only the SECOND part
        # carries the drifted decimal schema (ADVICE r11: a files[0]-only
        # footer read passes this while the driver hash fails).
        write_dump(out, "q_multifile", pa.table({
            "k": pa.array(["A"], pa.string()),
            "v": pa.array([1.25], pa.float64()),
        }))
        pq.write_table(pa.table({
            "k": pa.array(["B"], pa.string()),
            "v": pa.array([Decimal("2.250000")], pa.decimal128(27, 6)),
        }), os.path.join(out, "q_multifile", "part-1.parquet"))
        # Case 4 (must FAIL): the MASKING variant — the oracle IS decimal
        # and the dump's second part agrees with it, but part-0 is
        # double. A union of per-file decimal maps would match the
        # oracle and print PASS while the driver hash fails on part-0's
        # rows; per-file disagreement must be flagged directly.
        write_dump(out, "q_masked", pa.table({
            "k": pa.array(["A"], pa.string()),
            "v": pa.array([1.25], pa.float64()),
        }))
        pq.write_table(pa.table({
            "k": pa.array(["B"], pa.string()),
            "v": pa.array([Decimal("2.250000")], pa.decimal128(27, 6)),
        }), os.path.join(out, "q_masked", "part-1.parquet"))
        # Case 5 (must FAIL): engine emits a container-typed column — the
        # r12 q257 class. The local tool used to stringify-then-sort and
        # print PASS; the driver sorts RAW cells and errors ('unhashable
        # type: numpy.ndarray'). Values here even match the oracle's
        # stringification — the rejection must fire on the TYPE alone.
        write_dump(out, "q_container_engine", pa.table({
            "k": pa.array(["A"], pa.string()),
            "v": pa.array([[{"d": 1, "t": 2}]],
                          pa.list_(pa.struct([("d", pa.int64()),
                                              ("t", pa.int64())]))),
        }))
        # Case 6 (must FAIL): the ORACLE side emits a LIST column.
        write_dump(out, "q_container_oracle", pa.table({
            "k": pa.array(["A"], pa.string()),
            "v": pa.array(["[1, 2]"], pa.string()),
        }))
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({
                "q_drift": "SELECT 'A' AS k, CAST(52840.44 AS DOUBLE) AS v",
                "q_clean": "SELECT 'A' AS k, CAST(52840.44 AS DOUBLE) AS v",
                "q_multifile": "SELECT 'A' AS k, CAST(1.25 AS DOUBLE) AS v "
                               "UNION ALL SELECT 'B', CAST(2.25 AS DOUBLE)",
                "q_masked": "SELECT 'A' AS k, CAST(1.25 AS DECIMAL(27,6)) AS v "
                            "UNION ALL SELECT 'B', CAST(2.25 AS DECIMAL(27,6))",
                "q_container_engine":
                    "SELECT 'A' AS k, '[{''d'': 1, ''t'': 2}]' AS v",
                "q_container_oracle": "SELECT 'A' AS k, [1, 2] AS v",
            }, f)

        r = run_tool(sf, out)
        ok = True
        if r.returncode == 0:
            print("EXPECTED nonzero exit (drift present), got 0")
            ok = False
        if "FAIL q_drift: type drift" not in r.stdout:
            print("EXPECTED 'FAIL q_drift: type drift' in output")
            ok = False
        if "PASS q_clean" not in r.stdout:
            print("EXPECTED 'PASS q_clean' in output")
            ok = False
        if "FAIL q_multifile: type drift" not in r.stdout:
            print("EXPECTED 'FAIL q_multifile: type drift' (second-part "
                  "schema drift must not hide behind files[0])")
            ok = False
        if "FAIL q_masked: type drift" not in r.stdout:
            print("EXPECTED 'FAIL q_masked: type drift' (a decimal part "
                  "agreeing with a decimal oracle must not mask a double "
                  "part via map union)")
            ok = False
        if "FAIL q_container_engine: container-typed engine column" not in r.stdout:
            print("EXPECTED 'FAIL q_container_engine: container-typed "
                  "engine column' (r12 q257: the driver cannot sort raw "
                  "array cells; local stringify-first must not mask it)")
            ok = False
        if "FAIL q_container_oracle: container-typed oracle column" not in r.stdout:
            print("EXPECTED 'FAIL q_container_oracle: container-typed "
                  "oracle column'")
            ok = False
        if not ok:
            print("--- tool stdout ---")
            print(r.stdout)
            print(r.stderr[-2000:])
            return 1
        print("PASS test_compare_oracle: decimal-vs-double drift and "
              "container-typed columns are caught, clean double column "
              "still passes")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
