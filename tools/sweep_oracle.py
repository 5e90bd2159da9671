#!/usr/bin/env python3
"""sf0.1-scale oracle sweep with per-query timeouts: same compare semantics
as tools/diff_oracle.py (columns sorted by name, rows sorted by value, exact
value compare), but each DuckDB oracle runs in a child process under a
timeout so the known-intractable pair-join brute-force SQLs (hours at sf0.1
— RecallCheck covers those EXACT on the Spark side) are skipped loudly
instead of hanging the sweep.

Usage: python3 tools/sweep_oracle.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import glob
import json
import multiprocessing as mp
import sys

import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
timeout_s = int(sys.argv[3]) if len(sys.argv) > 3 else 120


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


# Lanes whose brute-force pair-join SQL is known-intractable at sf0.1 (hours
# in DuckDB); RecallCheck verifies exactly these EXACTLY on the Spark side
# (tools/run_fullscale.sh step 3). A TIMEOUT on any OTHER lane is red — a
# newly-slow oracle has no Spark-side cover.
EXPECTED_TIMEOUT = {
    "containment_neardup", "dedup_clusters", "dedup_keep_best",
    "incremental_clusters", "incremental_neardup", "leakage_split",
    "minhash_neardup", "ngram_jaccard_neardup", "editdist_neardup",
    "simhash_neardup", "semantic_dedup", "exact_substring_spans",
    "dedup_spans", "dup_ngram_frac",
}


def run_oracle(sql: str, q):
    # exceptions must reach the parent as an explicit marker: an uncaught
    # error here kills the child silently, q.get times out, and a BROKEN
    # oracle would classify as (tolerated) TIMEOUT instead of FAIL
    try:
        con = duckdb.connect()
        for tbl in ["region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
        q.put(("ok", con.execute(sql).fetchdf()))
    except Exception as e:
        q.put(("error", f"{type(e).__name__}: {e}"))


def compare(name: str, sql: str):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return ("NO_DUMP", None)
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files],
                               ignore_index=True))
    q = mp.Queue()
    p = mp.Process(target=run_oracle, args=(sql, q))
    p.start()
    try:
        status, payload = q.get(timeout=timeout_s)
    except Exception:
        p.terminate()
        p.join()
        if name in EXPECTED_TIMEOUT:
            return ("TIMEOUT", None)
        return ("FAIL", f"unexpected oracle timeout after {timeout_s}s "
                        "(not in EXPECTED_TIMEOUT)")
    p.join()
    if status == "error":
        return ("FAIL", f"oracle error: {payload}")
    ora_df = canon(payload)
    if list(spark_df.columns) != list(ora_df.columns):
        return ("FAIL", f"columns {list(spark_df.columns)} vs {list(ora_df.columns)}")
    if len(spark_df) != len(ora_df):
        return ("FAIL", f"rows {len(spark_df)} vs {len(ora_df)}")
    for c in spark_df.columns:
        sv, ov = spark_df[c], ora_df[c]
        try:
            eq = (sv == ov) | (sv.isna() & ov.isna())
        except Exception as e:
            return ("FAIL", f"col {c} compare error {e}")
        if not eq.all():
            i = eq.idxmin()
            return ("FAIL",
                    f"col {c} row {i}: spark={sv[i]!r} oracle={ov[i]!r}")
    return ("MATCH", len(spark_df))


def main():
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        status, detail = compare(name, oracle[name])
        results.setdefault(status, []).append((name, detail))
        print(f"== {name}: {status}"
              + (f" ({detail} rows)" if status == "MATCH" else
                 f" — {detail}" if detail else ""), flush=True)
    print()
    for status in ("MATCH", "TIMEOUT", "NO_DUMP", "FAIL"):
        rows = results.get(status, [])
        print(f"{status}: {len(rows)}"
              + ("" if status == "MATCH" or not rows
                 else "  [" + ", ".join(n for n, _ in rows) + "]"))
    # TRUE gate: FAIL or NO_DUMP is red. TIMEOUT is tolerated — those are
    # the known-intractable pair-join SQLs, and tools/run_fullscale.sh pairs
    # this sweep with RecallCheck, which verifies those lanes EXACTLY on the
    # Spark side (and itself exits 1 on any divergence).
    return 1 if (results.get("FAIL") or results.get("NO_DUMP")) else 0


if __name__ == "__main__":
    sys.exit(main())
