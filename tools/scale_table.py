#!/usr/bin/env python3
"""Render a graft.Scale time JSON line as a ratio-sorted markdown table.

Usage: scale_table.py <scale_time.json> [top_n]
"""
import json
import sys

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 0

with open(path) as f:
    doc = json.loads(f.read())

rows = sorted(
    ((r["ratio"], r["a"], r["b"], n)
     for n, r in doc["queries"].items() if "error" not in r),
    reverse=True)
if top:
    rows = rows[:top]

print("| query | a s | b s | ratio |")
print("|---|---|---|---|")
for ratio, a, b, name in rows:
    print(f"| {name} | {a:.2f} | {b:.2f} | {ratio:.2f} |")
for n, r in doc["queries"].items():
    if "error" in r:
        print(f"| {n} | — | — | ERROR: {r['error']} |")
print(f"\ntotalA={doc['totalA']:.1f} totalB={doc['totalB']:.1f} "
      f"totalRatio={doc['totalRatio']}")
