#!/usr/bin/env python3
"""Build the full-suite sf0.1 -> sf1 scaling-exponent table.

Inputs:
  BENCH_sf1_full.json  - full 22x-query suite at the synthesized sf1
                         (graft.ScaleUp perturb mode, local[32], iters=1)
  BENCH_REF.json       - per-query best-known-clean mins at sf0.1 (local[32])

exponent = log10(t_sf1 / t_sf01)  at a 10x data decade.

Emits a markdown table sorted by exponent (desc) and a summary line; queries
with exponent > FLAG are listed first. Sub-second sf0.1 queries are noisy
(fixed per-query overhead dominates), so the flag applies only where the sf1
time is material (>= MIN_SF1_SEC).
"""
import json, math, sys

FLAG = 1.3
MIN_SF1_SEC = 2.0

def per_query(path):
    # accepts either the bench side-file (line-JSON with a per_query line)
    # or a reference file (one JSON object with a "queries" map)
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d["queries"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "per_query":
            return d["queries"]
    raise SystemExit(f"no per_query map in {path}")

sf1 = per_query(sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1_full.json")
ref = per_query(sys.argv[2] if len(sys.argv) > 2 else "BENCH_REF.json")

rows = []
for q, t1 in sorted(sf1.items()):
    t0 = ref.get(q)
    if not t0:
        continue
    ratio = t1 / t0
    exp = math.log10(ratio) if ratio > 0 else float("nan")
    rows.append((q, t0, t1, ratio, exp))

rows.sort(key=lambda r: -r[4])
flagged = [r for r in rows if r[4] > FLAG and r[2] >= MIN_SF1_SEC]
print(f"queries={len(rows)} flagged(exp>{FLAG}, sf1>={MIN_SF1_SEC}s)={len(flagged)}")
print(f"total sf0.1={sum(r[1] for r in rows):.1f}s sf1={sum(r[2] for r in rows):.1f}s "
      f"aggregate exponent={math.log10(sum(r[2] for r in rows)/sum(r[1] for r in rows)):.2f}")
print()
print("| query | sf0.1 s | sf1 s | ratio @10x | exponent |")
print("|---|---|---|---|---|")
for q, t0, t1, ratio, exp in rows:
    mark = " **FLAG**" if (exp > FLAG and t1 >= MIN_SF1_SEC) else ""
    print(f"| `{q}` | {t0:.2f} | {t1:.2f} | {ratio:.1f}x | {exp:.2f}{mark} |")
