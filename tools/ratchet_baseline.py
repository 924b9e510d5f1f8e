#!/usr/bin/env python3
"""Ratchet bench_baseline.json (fenced-era per-query minima) with a new
committed bench run's times: for every query, keep min(existing, new);
new queries enter at their first measured time. Usage:
    python3 tools/ratchet_baseline.py [bench_last.json]
"""
import json
import sys

run_path = sys.argv[1] if len(sys.argv) > 1 else "bench_last.json"
run = json.load(open(run_path))["queries"]
base_doc = json.load(open("bench_baseline.json"))
base = base_doc["queries"]
updated = 0
added = 0
for q, t in run.items():
    if t < 0:
        continue
    if q not in base:
        base[q] = t
        added += 1
    elif t < base[q]:
        base[q] = round(t, 3)
        updated += 1
base_doc["queries"] = dict(sorted(base.items()))
with open("bench_baseline.json", "w") as f:
    json.dump(base_doc, f, indent=1)
    f.write("\n")
print(f"ratcheted {updated} minima, added {added} new queries")
