#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--skip a,b] [--only a,b]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the parquet tables in
<sfDir>, and compares: column name set, row count, and value-exact rows
(sorted by all columns, column order normalized by name).

--skip/--only exist for the big-SF sweeps: a few oracles (the DuckDB side,
not the Spark side) are out-of-core monsters at sf1 — copurchase_triangles
spills >60 GB of wedge intermediates — and once proven at a given SF they
can be skipped on re-sweeps instead of risking a disk-full abort.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
skip, only = set(), None
for i, a in enumerate(sys.argv):
    if a in ("--skip", "--only"):
        if i + 1 >= len(sys.argv):
            sys.exit(f"usage: {a} requires a comma-separated value")
        if a == "--skip":
            skip = set(sys.argv[i + 1].split(","))
        else:
            only = set(sys.argv[i + 1].split(","))

con = duckdb.connect()
# spill to /tmp, never to the repo cwd (.tmp/ in the worktree)
con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
# Optional hard cap for the sf10-class monster oracles: DuckDB's default
# (80% of RAM) races other JVMs on a shared host and dies on raw malloc
# ("bad allocation") instead of spilling; a bounded limit spills to the
# temp_directory instead.
_ml = os.environ.get("ORACLE_MEMORY_LIMIT")
if _ml:
    con.execute(f"SET memory_limit='{_ml}'")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver fixtures are single files; Spark-written replicas (MakeSfN)
    # are directories of part files
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

# Spark reads the driver's TIMESTAMP(NANOS) events.ts as BIGINT nanos
# (nanosAsLong) and Spark-written replicas (MakeSfN) persist it that way,
# where epoch_ns(ts)/strftime(ts, ...) can't bind (and DuckDB 1.0 has no
# make_timestamp_ns to rebuild sub-microsecond values). The oracle SQL is
# our own generated text, so rewrite the two ts idioms mechanically:
# epoch_ns(BIGINT ns) is the identity, and strftime only formats at day
# granularity so microsecond truncation is lossless there.
# Partial replicas (e.g. the sf10 documents+embeddings probe set) carry
# no events table at all; none of their oracles touch ts, so skip the
# probe instead of crashing before the first query.
try:
    ts_is_bigint = any(
        c[0] == "ts" and c[1] == "BIGINT"
        for c in con.execute("DESCRIBE events").fetchall())
except duckdb.CatalogException:
    ts_is_bigint = False

def adapt(sql: str) -> str:
    if not ts_is_bigint:
        return sql
    return (sql.replace("epoch_ns(ts)", "ts")
               .replace("strftime(ts,", "strftime(make_timestamp(ts // 1000),"))

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails = 0
skipped = 0
for name, sql in sorted(oracle.items()):
    if name in skip or (only is not None and name not in only):
        skipped += 1
        continue
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = pd.read_parquet(spark_path)
        want = con.sql(adapt(sql)).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"); fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    g, w = canon(got), canon(want)
    # dtype-KIND-strict first: the driver's hash gate normalizes integer
    # WIDTHS (int32 vs int64 both hash green, observed across r10's 179
    # passes) but NOT kinds — an int64 Spark column vs a DuckDB
    # HUGEINT/DECIMAL that lands as float64/object hashes differently even
    # when values agree. r10 shipped two oracles that passed a tolerant
    # local compare and failed the driver on exactly this, so any KIND
    # divergence (int vs float vs object/decimal) is a FAIL here too.
    def kind(s):
        k = s.dtype.kind
        return "i" if k in "iu" else k
    mismatch = None
    for c in g.columns:
        if kind(g[c]) != kind(w[c]):
            mismatch = (f"col {c}: dtype spark={g[c].dtype} oracle={w[c].dtype}"
                        " (driver hash gate is dtype-kind-strict; CAST the oracle)")
            break
    for c in (g.columns if not mismatch else []):
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
if skipped:
    print(f"SKIPPED {skipped} queries (--skip/--only)")
sys.exit(1 if fails else 0)
