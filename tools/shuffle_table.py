#!/usr/bin/env python3
"""Render a graft.Scale shuffle JSON line as markdown tables for SCALE.md.

Usage: shuffle_table.py <shuffle.json>

Emits (1) a per-query summary table — total shuffle bytes, exchange
count, and the largest SinglePartition exchange's bytes — and (2) the
complete list of SinglePartition exchanges with their measured bytes
and records, which is the claim under audit: every single-partition
combine moves O(partitions x rows-per-class) bytes, not data-sized
volume. Driver-side analysis helper only.
"""
import json
import sys


def human(n):
    if n < 0:
        return "n/a"
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024 or unit == "GB":
            return f"{n:.0f} {unit}" if unit == "B" else f"{n / 1.0:.1f} {unit}"
        n /= 1024.0
    return f"{n} B"


with open(sys.argv[1]) as f:
    doc = json.loads(f.read())

print(f"run: {doc['runDir']} (selection ranked at {doc['rankDir']})\n")
print("| query | result rows | exchanges | total shuffle | single-partition"
      " exchanges | max single-partition bytes |")
print("|---|---|---|---|---|---|")
errs = []
for name, q in sorted(doc["queries"].items(),
                      key=lambda kv: -kv[1].get("totalShuffleBytes", -1)):
    if "error" in q:
        errs.append((name, q["error"]))
        continue
    sp = [e for e in q["exchanges"] if e["single"]]
    print(f"| {name} | {q['rows']} | {len(q['exchanges'])} "
          f"| {human(q['totalShuffleBytes'])} | {len(sp)} "
          f"| {human(q['maxSinglePartitionBytes'])} |")
for name, msg in errs:
    print(f"| {name} | ERROR: {msg} | | | | |")

print("\nAll SinglePartition exchanges (bytes actually moved):\n")
print("| query | bytes | records |")
print("|---|---|---|")
rows = []
for name, q in doc["queries"].items():
    if "error" in q:
        continue
    for e in q["exchanges"]:
        if e["single"]:
            rows.append((e["bytesWritten"], e["recordsWritten"], name))
rows.sort(reverse=True)
for b, r, name in rows:
    print(f"| {name} | {b} | {r} |")
total_sp = sum(r[0] for r in rows)
print(f"\nSinglePartition exchanges: {len(rows)}, max bytes "
      f"{rows[0][0] if rows else 0}, total bytes {total_sp}")
