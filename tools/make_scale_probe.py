#!/usr/bin/env python3
"""Generate the NX synthetic scale-probe fixture (BASELINE.md "10x scale
probe"): replicate a base sf directory N times with all join keys offset
per replica (join cardinalities stay sane) while text/embeddings/events
payloads duplicate verbatim — deliberately duplication-heavy, the worst
case for near-dup operators.

Usage: python3 tools/make_scale_probe.py <base_sf_dir> <out_dir> [N=10]
Driver-side tool (duckdb), not part of the library.
"""
import sys, os, duckdb

base, out = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# table -> columns to offset by replica * (max+1) of that column
SHIFT = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_custkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

for tbl, keys in SHIFT.items():
    src = f"{base}/{tbl}.parquet"
    if not os.path.exists(src):
        continue
    cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    keys = [k for k in keys if k in cols]
    if not keys:  # small dims replicate once (shared across replicas)
        con.sql(f"COPY (SELECT * FROM '{src}') TO '{out}/{tbl}.parquet' (FORMAT parquet)")
        continue
    spans = {k: con.sql(f"SELECT MAX({k}) + 1 FROM '{src}'").fetchone()[0] for k in keys}
    sel = ", ".join(
        f"{c} + r.r * {spans[c]} AS {c}" if c in spans else c for c in cols)
    con.sql(f"""COPY (SELECT {sel} FROM '{src}', (SELECT unnest(range(0, {n})) AS r) r)
      TO '{out}/{tbl}.parquet' (FORMAT parquet)""")
    print(tbl, "x", n)
print("done ->", out)
