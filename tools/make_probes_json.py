#!/usr/bin/env python3
"""Run graft.Probe over a set of fixture dirs and emit a machine-readable
slope artifact (PROBES_r{N}.json) so scale-probe evidence is diffable
round-over-round instead of living in BASELINE.md prose.

Output shape:
  {"action": "noop-write", "cpus": "...", "dirs": {label: dir, ...},
   "queries": {q: {label: sec, ..., "slope_per_decade": r}, ...}}

slope_per_decade = (t_last / t_first) ** (1 / decades) where decades =
log10(scale_last / scale_first) — i.e. the per-10× runtime multiplier;
1.0 = flat, 10.0 = linear-in-time with data (still fine if work is
linear), >> 10 = superlinear trouble.

Usage:
  python3 tools/make_probes_json.py OUT.json LABEL=DIR[:SCALE] ... -- q1 q2 ...
e.g.
  python3 tools/make_probes_json.py PROBES_r6.json \
    sf01=/root/testdata/sf0.1:1 x10=/tmp/probe10:10 x100=/tmp/probe100:100 \
    -- q01_agg_pricing_summary q05_join_inner
Driver-side tool, not part of the library.
"""
import json, math, os, re, subprocess, sys

out_path = sys.argv[1]
sep = sys.argv.index("--")
dir_specs, queries = sys.argv[2:sep], sys.argv[sep + 1:]

dirs = {}   # label -> (dir, scale)
for spec in dir_specs:
    label, rest = spec.split("=", 1)
    if rest.count(":"):
        d, scale = rest.rsplit(":", 1)
        dirs[label] = (d, float(scale))
    else:
        dirs[label] = (rest, None)

times = {q: {} for q in queries}
env = dict(os.environ)
for label, (d, _) in dirs.items():
    cmd = ["sbt", "-batch", "runMain graft.Probe %s %s" % (d, " ".join(queries))]
    print(">>", label, d, flush=True)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    hits = 0
    for line in p.stdout.splitlines():
        m = re.search(r"PROBE (\S+): ([0-9.]+) s", line)
        if m and m.group(1) in times:
            times[m.group(1)][label] = float(m.group(2))
            hits += 1
    if hits != len(queries):
        print("WARN: %s: %d/%d PROBE lines (rc=%d)" %
              (label, hits, len(queries), p.returncode), file=sys.stderr)
        print(p.stdout[-2000:], file=sys.stderr)

labeled = [(l, s) for l, (_, s) in dirs.items() if s is not None]
labeled.sort(key=lambda x: x[1])
for q, t in times.items():
    if len(labeled) >= 2:
        (l0, s0), (l1, s1) = labeled[0], labeled[-1]
        if l0 in t and l1 in t and t[l0] > 0:
            decades = math.log10(s1 / s0)
            t["slope_per_decade"] = round(
                (t[l1] / t[l0]) ** (1 / decades), 2)

doc = {"action": "noop-write",
       "cpus": env.get("SPARK_GRAFT_CPUS", "4 (Probe default local[4])"),
       "dirs": {l: d for l, (d, _) in dirs.items()},
       "scales": {l: s for l, s in labeled},
       "queries": times}
with open(out_path, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
print("wrote", out_path)
