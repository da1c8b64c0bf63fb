#!/usr/bin/env python3
"""Regenerate BASELINE.md's measured table from BENCH_SELF.json.

Usage: python3 tools/baseline_md.py  (run from the repo root after an idle
`graft.Bench` pass at sf0.1 with SPARK_GRAFT_PROVENANCE=builder-idle)

Prints the markdown table (query | warm sec | memo build | sentinel) plus
the headline totals; the surrounding prose in BASELINE.md is maintained by
hand.

The "sec" column is the min-of-runs STEADY-STATE (warm-memo) cost; for
memo first-payer queries the once-per-process scratch-build seconds appear
separately in "memo build" (r8 verdict task 1: a driver run whose first
timed run pays a build is only comparable to baseline when cold and warm
are split — min-of-two alone hid the build in the discarded first run).
A fair driver-vs-baseline compare is: driver_row ≲ 2× (warm + memo/runs)
for first payers, driver_row ≲ 2× warm for everyone else.
"""
import json

d = json.load(open("BENCH_SELF.json"))
qs, sent, spread = d["queries"], d["sentinel"], d["spread"]
memo = d.get("memo_build", {})
print(f'<!-- source: BENCH_SELF.json provenance={d.get("provenance")} '
      f'sf={d["sf"]} cpus={d["cpus"]} sentinel_median={d["sentinel_median"]} -->')
print("| query | warm sec @sf0.1 | memo build (first payer) | load sentinel |")
print("|---|---|---|---|")
for k in sorted(qs):
    m = f"{memo[k]:.2f}" if k in memo else ""
    print(f"| {k} | {qs[k]:.2f} | {m} | {sent[k]:.3f} |")
tot_memo = sum(memo.values())
print(f"| **total** | **{d['value']}** | **{tot_memo:.2f}** "
      f"| median {d['sentinel_median']} |")
