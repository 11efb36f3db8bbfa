#!/usr/bin/env python3
"""Build the full-suite sf0.1 -> sf1 scaling-exponent table.

Inputs (defaults are the committed SAME-EPOCH pair — both sides measured
back-to-back on the same box in the same half-day, same code):
  BENCH_sf1_close.json       - the committed full-suite sf1 close
                               (graft.ScaleUp perturb mode, local[32])
  BENCH_sf01_epoch_twin.json - the sf0.1 side of the SAME epoch (the
                               committed BENCH_METRIC.json close is a
                               different, faster epoch — pairing across
                               epochs inflates exponents ~0.03 aggregate
                               and manufactures phantom per-lane flags)

exponent = log10(t_sf1 / t_sf01)  at a 10x data decade.

Emits a markdown table sorted by exponent (desc) and a summary line; queries
with exponent > FLAG are listed first. Sub-second sf0.1 queries are noisy
(fixed per-query overhead dominates), so the flag applies only where the sf1
time is material (>= MIN_SF1_SEC).

Staleness guard: exponents from artifacts of DIFFERENT bench epochs (e.g. a
probe-5-era BENCH_sf1_full.json vs today's floors) describe code that no
longer exists — a bare run against such a pair once reported 13 phantom
flags. The tool warns when either input is >24h older than the other or than
the repo's committed close.
"""
import json, math, os, sys

FLAG = 1.3
MIN_SF1_SEC = 2.0

DEFAULT_SF1 = "BENCH_sf1_close.json"
DEFAULT_REF = "BENCH_sf01_epoch_twin.json"


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


sf1_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF1
ref_path = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_REF

# staleness guard: mtimes more than a day apart almost always means one
# side predates a rewrite the other side already reflects
try:
    m1, m0 = os.path.getmtime(sf1_path), os.path.getmtime(ref_path)
    if abs(m1 - m0) > 86400:
        print(f"WARNING: {sf1_path} and {ref_path} mtimes differ by "
              f"{abs(m1 - m0) / 3600:.0f}h — likely DIFFERENT bench epochs; "
              f"exponents across epochs describe code that no longer exists.",
              file=sys.stderr)
except OSError:
    pass

sf1 = per_query(sf1_path)
ref = per_query(ref_path)

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
print(f"pair: {sf1_path} vs {ref_path}")
print(f"queries={len(rows)} flagged(exp>{FLAG}, sf1>={MIN_SF1_SEC}s)={len(flagged)}")
print(f"total sf0.1={sum(r[1] for r in rows):.1f}s sf1={sum(r[2] for r in rows):.1f}s "
      f"aggregate exponent={math.log10(sum(r[2] for r in rows)/sum(r[1] for r in rows)):.2f}")
print()
print("| query | sf0.1 s | sf1 s | ratio @10x | exponent |")
print("|---|---|---|---|---|")
for q, t0, t1, ratio, exp in rows:
    mark = " **FLAG**" if (exp > FLAG and t1 >= MIN_SF1_SEC) else ""
    print(f"| `{q}` | {t0:.2f} | {t1:.2f} | {ratio:.1f}x | {exp:.2f}{mark} |")
