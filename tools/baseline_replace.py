#!/usr/bin/env python3
"""Replace BASELINE.md's operative measured table in place from
BENCH_SELF.json (round-12 refresh). The prose header is rewritten with
the new totals; everything between the '## Measured (round' header and
the '## Measured at sf1' header is regenerated.

Usage: python3 tools/baseline_replace.py <round> [prose-file]
"""
import json
import sys

rnd = sys.argv[1]
d = json.load(open("BENCH_SELF.json"))

# r12 verdict task 7: the operative table must NEVER ingest a hot run.
# graft.Bench labels builder runs via SPARK_GRAFT_PROVENANCE=builder-idle
# (sf1: builder-idle-sf1); anything else (the driver's per-round gate, an
# ad-hoc re-run) reports "unlabeled" — refuse it here so the label
# discipline is enforced mechanically, not by convention.
prov = str(d.get("provenance", ""))
if not prov.startswith("builder-idle"):
    sys.exit(f"refusing to regenerate BASELINE.md: BENCH_SELF.json "
             f"provenance={prov!r} is not a builder-idle run")

qs, sent, memo = d["queries"], d["sentinel"], d.get("memo_build", {})

lines = []
lines.append(f"## Measured (round {rnd}, this engine — the OPERATIVE table)")
lines.append("")
if len(sys.argv) > 2:
    lines.append(open(sys.argv[2]).read().rstrip())
    lines.append("")
lines.append(f'<!-- source: BENCH_SELF.json provenance={d.get("provenance")} '
             f'sf={d["sf"]} cpus={d["cpus"]} sentinel_median={d["sentinel_median"]} -->')
lines.append("| query | warm sec @sf0.1 | memo build (first payer) | load sentinel |")
lines.append("|---|---|---|---|")
for k in sorted(qs):
    m = f"{memo[k]:.2f}" if k in memo else ""
    lines.append(f"| {k} | {qs[k]:.2f} | {m} | {sent[k]:.3f} |")
tot_memo = sum(memo.values())
lines.append(f"| **total** | **{d['value']}** | **{tot_memo:.2f}** "
             f"| median {d['sentinel_median']} |")
lines.append("")

src = open("BASELINE.md").read().splitlines()
start = next(i for i, l in enumerate(src) if l.startswith("## Measured (round"))
end = next(i for i, l in enumerate(src) if l.startswith("## Measured at sf1"))
out = src[:start] + lines + src[end:]
open("BASELINE.md", "w").write("\n".join(out) + "\n")
print(f"replaced lines {start}..{end} with {len(lines)} lines; "
      f"total={d['value']} rows={len(qs)}")
