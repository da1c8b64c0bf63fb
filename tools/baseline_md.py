#!/usr/bin/env python3
"""Regenerate BASELINE.md's measured table from BENCH_SELF.json.

Usage: python3 tools/baseline_md.py  (run from the repo root after an idle
`graft.Bench` pass at sf0.1 with SPARK_GRAFT_PROVENANCE=builder-idle)

Prints the markdown table (query | sec | sentinel) plus the headline
totals; the surrounding prose in BASELINE.md is maintained by hand.
"""
import json

d = json.load(open("BENCH_SELF.json"))
qs, sent, spread = d["queries"], d["sentinel"], d["spread"]
print(f'<!-- source: BENCH_SELF.json provenance={d.get("provenance")} '
      f'sf={d["sf"]} cpus={d["cpus"]} sentinel_median={d["sentinel_median"]} -->')
print("| query | sec @sf0.1 | load sentinel |")
print("|---|---|---|")
for k in sorted(qs):
    print(f"| {k} | {qs[k]:.2f} | {sent[k]:.3f} |")
print(f"| **total** | **{d['value']}** | median {d['sentinel_median']} |")
