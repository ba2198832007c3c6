#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_correctness.py <sfDir> <verifyOutDir>

For each query parquet under verifyOutDir, runs the matching oracle SQL
from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet registered as
views), sorts columns by name, sorts rows, and hash-compares values.
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    # normalize values to strings exactly like the driver (no float rounding:
    # a DuckDB HUGEINT rendered "123.0" must mismatch Spark's "123")
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(str(v) for v in t))
    return cols, sorted(rows)

fails = ok = 0
for name in sorted(oracles):
    qdir = f"{out_dir}/{name}"
    if not os.path.isdir(qdir):
        print(f"MISSING-RESULT {name}")
        fails += 1
        continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
    try:
        oracle_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"ORACLE-ERROR   {name}: {e}")
        fails += 1
        continue
    sc, sr = canon(spark_df)
    oc, orr = canon(oracle_df)
    if sc != oc:
        print(f"SCHEMA-MISMATCH {name}: spark={sc} oracle={oc}")
        fails += 1
    elif sr != orr:
        diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        extra = f" rows spark={len(sr)} oracle={len(orr)}"
        print(f"VALUE-MISMATCH {name}:{extra} first diffs={diffs}")
        fails += 1
    else:
        print(f"OK             {name} ({len(sr)} rows)")
        ok += 1

# queries with results but no oracle → rows-only check
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(qdir)
    if name not in oracles and os.path.isdir(qdir):
        n = len(con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
        print(f"ROWS-ONLY      {name} ({n} rows)")

print(f"\n{ok} ok, {fails} failed, {len(oracles)} oracles")
sys.exit(1 if fails else 0)
