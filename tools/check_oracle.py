#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the parquet tables in
<sfDir>, and compares: column name set, row count, and value-exact rows
(sorted by all columns, column order normalized by name).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = pd.read_parquet(spark_path)
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"); fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    g, w = canon(got), canon(want)
    # dtype-tolerant compare: numeric columns via exact equality after
    # float64 cast; everything else as strings
    mismatch = None
    for c in g.columns:
        gc, wc = g[c], w[c]
        try:
            import numpy as np
            if pd.api.types.is_numeric_dtype(gc) or pd.api.types.is_numeric_dtype(wc):
                gv, wv = gc.astype("float64"), wc.astype("float64")
                neq = ~((gv == wv) | (gv.isna() & wv.isna()))
            else:
                neq = gc.astype(str) != wc.astype(str)
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"; break
        if neq.any():
            i = int(neq.idxmax())
            mismatch = f"col {c} row {i}: spark={g[c].iloc[i]!r} oracle={w[c].iloc[i]!r} ({int(neq.sum())} diffs)"
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}"); fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
sys.exit(1 if fails else 0)
