#!/usr/bin/env python3
"""Read a graft.Scale time JSON line and rank queries by B/A ratio.

Usage: scale_flags.py <scale_time.json> [flag_threshold]

Prints every query sorted by ratio (descending) with a FLAG marker on
rows above the threshold (default 13 — the 10x-data super-linear flag
from the round-10 verdict, leaving headroom for fixed per-query
overhead), and errors last. Driver-side analysis helper only.
"""
import json
import sys

path = sys.argv[1]
flag = float(sys.argv[2]) if len(sys.argv) > 2 else 13.0

with open(path) as f:
    doc = json.loads(f.read())

rows = []
errs = []
for name, r in doc["queries"].items():
    if "error" in r:
        errs.append((name, r["error"]))
    else:
        rows.append((r["ratio"], r["a"], r["b"], name))

rows.sort(reverse=True)
print(f"{'ratio':>7} {'a_sec':>8} {'b_sec':>9}  query")
for ratio, a, b, name in rows:
    mark = "  <-- FLAG" if ratio > flag else ""
    print(f"{ratio:7.2f} {a:8.3f} {b:9.3f}  {name}{mark}")
for name, msg in errs:
    print(f"ERROR  {name}: {msg}")
print(f"\ntotalA={doc['totalA']} totalB={doc['totalB']} "
      f"totalRatio={doc['totalRatio']} flagged="
      f"{sum(1 for r in rows if r[0] > flag)} errors={len(errs)}")
