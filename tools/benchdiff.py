#!/usr/bin/env python3
"""Compare two Bench metric files: per-query ratios, contamination evidence.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [--threshold 1.5]

Prints queries whose new/old ratio exceeds the threshold (either direction),
plus the self-diagnosis fields (load average, cpu/wall, iteration spread) so
a contended run is distinguishable from a real regression before anyone
chases a phantom.
"""
import json
import sys


def load(path):
    # Metric files are 1-2 JSON lines (compact metric + optional diagnostics
    # since round 4); merge them into one dict. Older single-object files
    # still parse.
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        merged = {}
        for line in text.splitlines():
            line = line.strip()
            if line:
                merged.update(json.loads(line))
        return merged


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] / old['value']:.2f}x)")
    for name, d in (("old", old), ("new", new)):
        la = d.get("load_avg_start", "n/a")
        cw = d.get("cpu_wall_ratio", "n/a")
        it = d.get("iters", 1)
        print(f"  {name}: load_start={la} cpu/wall={cw} iters={it}")
    spread = new.get("iter_spread", {})
    rows = []
    for q in sorted(set(oq) | set(nq)):
        if q not in oq:
            rows.append((float("inf"), q, None, nq[q], spread.get(q)))
        elif q not in nq:
            rows.append((0.0, q, oq[q], None, None))
        else:
            rows.append((nq[q] / oq[q] if oq[q] > 0 else float("inf"),
                         q, oq[q], nq[q], spread.get(q)))
    flagged = [r for r in rows if r[0] >= thr or r[0] <= 1 / thr]
    if not flagged:
        print(f"no per-query change beyond {thr}x")
        return
    print(f"\nqueries beyond {thr}x (new/old, worst first):")
    for ratio, q, o, n, sp in sorted(flagged, reverse=True):
        o_s = f"{o:.2f}" if o is not None else "NEW"
        n_s = f"{n:.2f}" if n is not None else "GONE"
        sp_s = f" spread={sp:.2f}" if isinstance(sp, float) else ""
        tag = " <- high spread: likely contention" \
            if isinstance(sp, float) and sp > 2.0 else ""
        print(f"  {q:26s} {o_s:>8} -> {n_s:>8}  {ratio:5.2f}x{sp_s}{tag}")


if __name__ == "__main__":
    main()
