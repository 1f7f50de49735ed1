#!/usr/bin/env python3
"""Merge a make_probes_json.py output into an existing PROBES_r{N}.json,
keeping existing query rows and adding/overwriting the new ones.

Usage: python3 tools/merge_probes.py TARGET.json NEW.json
Driver-side tool, not part of the library.
"""
import json, sys

target, new = sys.argv[1], sys.argv[2]
with open(target) as f:
    t = json.load(f)
with open(new) as f:
    n = json.load(f)
t["queries"].update(n["queries"])
notes = t.get("notes", [])
for extra in n.get("notes", []):
    if extra not in notes:
        notes.append(extra)
t["notes"] = notes
with open(target, "w") as f:
    json.dump(t, f, indent=1, sort_keys=True)
print("merged %d rows into %s (now %d queries)" %
      (len(n["queries"]), target, len(t["queries"])))
