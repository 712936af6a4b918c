#!/usr/bin/env python3
"""Round-over-round bench trend from bench_history.jsonl.

Groups full-suite runs by code version (srctree stamp when present,
commit otherwise), takes per-gate MINIMA within each era (the
reproducible capability — single samples swing up to 4x with ambient
load on this box), and compares the two most recent eras:

  - the RATIO DISTRIBUTION separates a real regression from ambient
    drift: a uniform median ratio (every gate moved by ~the same
    factor) is host speed, a long tail on specific gates is code;
  - gates present only in the newer era are listed as additions.

Usage: python3 tools/bench_trend.py [bench_history.jsonl] [--sf SUFFIX]
SF defaults to sf0.1 (the driver's bench scale); lines at other SFs
are never mixed in (they share gate names but not magnitudes).
"""
import json
import statistics
import sys


def eras(path, sf):
    runs = []
    for line in open(path):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if not d.get("sf", "").endswith(sf) or not d.get("queries"):
            continue
        key = d.get("srctree", "")
        if not key or key == "unknown":
            key = d.get("commit", "unknown")
        runs.append((key, d))
    # era = consecutive runs with the same code key (history is
    # append-ordered, so consecutive grouping keeps a revisited key
    # from merging across an intervening code change)
    grouped = []
    for key, d in runs:
        if grouped and grouped[-1][0] == key:
            grouped[-1][1].append(d)
        else:
            grouped.append((key, [d]))
    return grouped


def mins(runs):
    m = {}
    for d in runs:
        for k, v in d["queries"].items():
            m[k] = min(m.get(k, float("inf")), v)
    return m


def main():
    # positional args = everything that is neither a --flag nor the
    # VALUE of --sf (round-17 ADVICE: `--sf sf0.01` with no explicit
    # history path otherwise made the sf value the history file)
    flag_values = {i + 1 for i, a in enumerate(sys.argv) if a == "--sf"}
    args = [a for i, a in enumerate(sys.argv[1:], start=1)
            if not a.startswith("--") and i not in flag_values]
    path = args[0] if args else "bench_history.jsonl"
    sf = "sf0.1"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    grouped = eras(path, sf)
    if len(grouped) < 2:
        print(f"need >=2 code eras at {sf}; found {len(grouped)}")
        return
    (ko, old), (kn, new) = grouped[-2], grouped[-1]
    mo, mn = mins(old), mins(new)
    common = sorted(set(mo) & set(mn))
    if not common:
        print("no common gates between the last two eras")
        return
    ratios = sorted(((mn[k] / mo[k], k) for k in common), reverse=True)
    med = statistics.median(r for r, _ in ratios)
    print(f"era OLD {ko[:12]} ({len(old)} runs)  ->  NEW {kn[:12]} "
          f"({len(new)} runs), {len(common)} common gates at {sf}")
    print(f"sum of per-gate minima: {sum(mo[k] for k in common):.1f} s -> "
          f"{sum(mn[k] for k in common):.1f} s")
    print(f"median per-gate ratio {med:.2f} (uniform => ambient host "
          f"speed, not code)")
    print("gates > 1.5x the median ratio (the code-regression signal):")
    flagged = [(r, k) for r, k in ratios if r > 1.5 * med and mn[k] > 0.5]
    for r, k in flagged or []:
        print(f"  {k:30s} {mo[k]:7.2f} -> {mn[k]:7.2f}  x{r:.2f}")
    if not flagged:
        print("  (none above 0.5 s — capability flat)")
    added = sorted(set(mn) - set(mo))
    if added:
        print("new gates:", ", ".join(f"{k}={mn[k]:.2f}s" for k in added))


if __name__ == "__main__":
    main()
