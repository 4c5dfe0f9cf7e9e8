#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify (done via
sbt beforehand), then compare each query's parquet output against the
DuckDB oracle on the same tables. Usage:
    python3 tools/parity.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
ok, bad, skipped = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        skipped.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}"))
        continue
    # driver-style compare: sort columns by name, then sort rows, hash values
    def canon(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        bad.append((name, f"schema: got {list(g.columns)} want {list(e.columns)}"))
        continue
    if len(g) != len(e):
        bad.append((name, f"rows: got {len(g)} want {len(e)}"))
        continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        ok.append(name)
    except AssertionError as ex:
        bad.append((name, str(ex).split("\n")[0] + " | " + str(ex)[:500]))

print(f"OK      ({len(ok)}): {' '.join(ok)}")
for n, r in bad:
    print(f"MISMATCH {n}: {r[:400]}")
for n, r in skipped:
    print(f"ROWS-ONLY {n}: {r} rows")
sys.exit(1 if bad else 0)
