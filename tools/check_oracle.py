#!/usr/bin/env python3
"""Local pre-validation of the driver's correctness gate (t2).

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>

Replays what the driver does: for each query dumped by graft.Verify,
run its oracle SQL in DuckDB over the same parquet tables and compare
schema + values exactly (no tolerance — the driver hash-compares).
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df())
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        probs = []
        if list(got.columns) != list(want.columns):
            probs.append(f"columns {list(got.columns)} != {list(want.columns)}")
        elif got.shape != want.shape:
            probs.append(f"shape {got.shape} != {want.shape}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    probs.append(f"dtype[{c}] {got[c].dtype} != {want[c].dtype}")
            if not probs:
                for c in got.columns:
                    a, b = got[c], want[c]
                    if a.dtype == object:
                        eq = (a.astype(str).where(~a.isna(), "\0NULL") ==
                              b.astype(str).where(~b.isna(), "\0NULL"))
                    else:
                        eq = (a == b) | (a.isna() & b.isna())
                    if not eq.all():
                        i = int(np.argmin(eq.values))
                        probs.append(
                            f"value[{c}] row {i}: {a.iloc[i]!r} != {b.iloc[i]!r}")
        if probs:
            failures += 1
            print(f"FAIL {name} ({len(got)} rows): " + "; ".join(probs[:4]))
        else:
            print(f"ok   {name} ({len(got)} rows)")
    # rows-only queries: just confirm the dump exists and has rows
    import glob, os
    for d in sorted(glob.glob(f"{outdir}/q*")):
        name = os.path.basename(d)
        if name in oracle or not os.path.isdir(d):
            continue
        try:
            n = con.sql(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"rows-only {name}: {n} rows" + ("  (EMPTY!)" if n == 0 else ""))
        except Exception as e:
            print(f"rows-only {name}: READ ERROR {e}")
            failures += 1
    print(f"\n{failures} failures / {len(oracle)} oracled queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
