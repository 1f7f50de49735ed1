#!/usr/bin/env python3
"""Generate the NX synthetic scale-probe fixture (BASELINE.md "10x scale
probe"): replicate a base sf directory N times with all join keys offset
per replica (join cardinalities stay sane) while text/embeddings/events
payloads duplicate verbatim — deliberately duplication-heavy, the worst
case for near-dup operators.

With --skew, fact-side foreign keys are additionally remapped onto a
zipf(1) (log-uniform-rank) distribution over the FULL replicated key
domain — dimension keys stay unique and dense, so joins stay valid but
a handful of keys carry most of the fact rows. Replication alone keeps
key frequencies uniform; --skew is how the big joins/windows get
measured under the hot-key condition AQE/salting exists for. The remap
is a deterministic per-ROW hash (not per-value), so row mass follows
the zipf shape exactly and reruns are reproducible.

Usage: python3 tools/make_scale_probe.py <base_sf_dir> <out_dir> [N=10] [--skew]
Driver-side tool (duckdb), not part of the library.
"""
import sys, os, duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
skew = any(a.startswith("--skew") for a in sys.argv)
# --skew-hot=0.3 sends that row fraction to key 1 (the AQE skew-split
# trigger condition); remaining rows stay zipf(1)
hot = 0.0
for a in sys.argv:
    if a.startswith("--skew-hot="):
        hot = float(a.split("=", 1)[1])
base, out = args[0], args[1]
n = int(args[2]) if len(args) > 2 else 10
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

    def shifted(c):
        return f"{c} + r.r * {spans[c]}" if c in spans else c

    # fk -> per-row seed expr (unique per row so row MASS is zipf-shaped)
    SKEW = {
        "orders": {"o_custkey": "o_orderkey * {n} + r.r"},
        "lineitem": {"l_suppkey": "l_orderkey * 16 + l_linenumber + r.r",
                     "l_custkey": "l_orderkey * 16 + l_linenumber + r.r + 7",
                     "l_partkey": "l_orderkey * 16 + l_linenumber + r.r + 13",
                     "l_orderkey": "l_orderkey * 16 + l_linenumber + r.r + 29"},
        "events": {"user_id": "event_id * {n} + r.r"},
    }.get(tbl, {}) if skew else {}

    def render(c):
        if c in SKEW and c in spans:
            dom = spans[c] * n - 1  # replicated dims cover 1..span*n-1
            seed = SKEW[c].format(n=n)
            # rank = dom**u, u~U[0,1): P(rank<=k) = ln k / ln dom (zipf-1)
            z = (f"GREATEST(1, CAST(pow({dom}, "
                 f"(hash({seed}) % 1000003) / 1000003.0) AS BIGINT))")
            if hot > 0:  # route a fixed row fraction onto key 1
                z = (f"CASE WHEN (hash({seed} + 1) % 1000003) / 1000003.0 "
                     f"< {hot} THEN 1 ELSE {z} END")
            return f"{z} AS {c}"
        return f"{shifted(c)} AS {c}"

    sel = ", ".join(render(c) for c in cols)
    con.sql(f"""COPY (SELECT {sel} FROM '{src}', (SELECT unnest(range(0, {n})) AS r) r)
      TO '{out}/{tbl}.parquet' (FORMAT parquet)""")
    print(tbl, "x", n, "(skewed: " + ",".join(SKEW) + ")" if SKEW else "")
print("done ->", out)
