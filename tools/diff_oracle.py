#!/usr/bin/env python3
"""Dev harness replicating the driver's correctness compare: for each query
name given, load the Spark parquet dump (written by `graft.Verify`) and the
DuckDB oracle result, sort columns by name + rows by value, and print whether
they hash-match — and if not, the first differing rows.

Usage: python3 tools/diff_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, os, sys, glob
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if not names:
    names = sorted(oracle.keys())

con = duckdb.connect()
# deterministic TIMESTAMPTZ handling whatever the host tz: a tz-drifted regen
# (regen_sim.py `tz`) makes timestamp columns TIMESTAMPTZ in DuckDB, and any
# naive-cast/strftime of those consults the session TimeZone
con.execute("SET TimeZone='UTC'")
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    # a regenerated table may arrive as a DIRECTORY of part files (the engine
    # reads both layouts); point DuckDB at the matching glob
    path = f"{sf_dir}/{tbl}.parquet"
    if os.path.isdir(path):
        # recursive: part files may be nested (e.g. partition subdirectories)
        path = f"{path}/**/*.parquet"
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize float formatting for compare
    return df

for name in names:
    if name not in oracle:
        print(f"== {name}: NO ORACLE (rows-only)")
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"== {name}: NO SPARK DUMP")
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        ora_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"== {name}: ORACLE SQL ERROR: {e}")
        continue
    s, o = canon(spark_df), canon(ora_df)
    if list(s.columns) != list(o.columns):
        print(f"== {name}: SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
        continue
    if len(s) != len(o):
        print(f"== {name}: ROWS MISMATCH spark={len(s)} oracle={len(o)}")
        continue
    # the driver's hash canonicalizes integer widths (int32==int64 was green
    # in r1) but int64 123 vs float64 123.0 differ — flag kind mismatches only
    dt = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
          if s[c].dtype.kind != o[c].dtype.kind]
    if dt:
        print(f"== {name}: DTYPE MISMATCH {dt}")
        continue
    mism = []
    for c in s.columns:
        sv, ov = s[c], o[c]
        try:
            eq = (sv == ov) | (sv.isna() & ov.isna())
        except Exception:
            eq = sv.astype(str) == ov.astype(str)
        bad = (~eq).to_numpy().nonzero()[0]
        if len(bad):
            mism.append((c, bad[:5]))
    if not mism:
        print(f"== {name}: MATCH ({len(s)} rows)")
    else:
        print(f"== {name}: VALUE MISMATCH ({len(s)} rows)")
        for c, bad in mism:
            for i in bad:
                print(f"   col={c} row={i} spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}")
