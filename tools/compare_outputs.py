#!/usr/bin/env python3
"""Full-output determinism compare between two Verify output dirs.

Usage: python3 tools/compare_outputs.py <outDirA> <outDirB>

Reads every query's parquet result from both dirs and asserts the
FULL output (all columns, all rows, exact values — not just the
driver's hash) is identical after a canonical sort. Used for the
per-round 5-cpu vs 16-cpu determinism re-check: a query whose output
depends on partitioning/parallelism (unstable ordering fed to a
row_number, a non-commutative fold, a first()/head() on an unordered
frame) diverges here even when each run individually looks plausible.
"""
import sys
import duckdb

def main():
    a, b = sys.argv[1], sys.argv[2]
    import os
    names = sorted(
        d for d in os.listdir(a)
        if os.path.isdir(os.path.join(a, d)))
    namesB = sorted(
        d for d in os.listdir(b)
        if os.path.isdir(os.path.join(b, d)))
    if names != namesB:
        print("QUERY SET MISMATCH", set(names) ^ set(namesB))
        sys.exit(1)
    con = duckdb.connect()
    bad = 0
    for n in names:
        try:
            diff = con.execute(f"""
                SELECT count(*) FROM (
                  (SELECT * FROM parquet_scan('{a}/{n}/*.parquet')
                   EXCEPT ALL
                   SELECT * FROM parquet_scan('{b}/{n}/*.parquet'))
                  UNION ALL
                  (SELECT * FROM parquet_scan('{b}/{n}/*.parquet')
                   EXCEPT ALL
                   SELECT * FROM parquet_scan('{a}/{n}/*.parquet')))
            """).fetchone()[0]
            na = con.execute(
                f"SELECT count(*) FROM parquet_scan('{a}/{n}/*.parquet')"
            ).fetchone()[0]
            nb = con.execute(
                f"SELECT count(*) FROM parquet_scan('{b}/{n}/*.parquet')"
            ).fetchone()[0]
            if diff == 0 and na == nb:
                print(f"IDENTICAL     {n} ({na} rows)")
            else:
                print(f"DIVERGED      {n} (rows {na} vs {nb}, "
                      f"symmetric diff {diff})")
                bad += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR         {n}: {e}")
            bad += 1
    print(f"\n{len(names) - bad} identical, {bad} diverged, "
          f"{len(names)} queries")
    sys.exit(1 if bad else 0)

main()
