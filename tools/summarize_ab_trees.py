#!/usr/bin/env python
"""Summarize the alternating old/new tree bench A/B (tools/ab_trees_r14.sh):
per-query medians for each tree, ratio, and totals. Reads
plans/r14/ab_trees/{old,new}_N.json.
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14", "ab_trees")


def med(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def load(prefix):
    runs = []
    for p in sorted(glob.glob(os.path.join(OUT, f"{prefix}_*.json"))):
        with open(p) as f:
            line = f.read().strip().splitlines()[-1]
        runs.append(json.loads(line))
    return runs


def main():
    old_runs, new_runs = load("old"), load("new")
    print(f"old runs: {len(old_runs)}  new runs: {len(new_runs)}")
    print("old totals:", [r["value"] for r in old_runs])
    print("new totals:", [r["value"] for r in new_runs])
    names = list(old_runs[0]["queries"])
    rows = []
    for n in names:
        o = med([r["queries"][n] for r in old_runs])
        w = med([r["queries"].get(n, float("nan")) for r in new_runs])
        rows.append((n, o, w, o / w if w else float("nan")))
    rows.sort(key=lambda r: -r[1])
    print(f"\n| query | old med s | new med s | speedup old/new |")
    print("|---|---|---|---|")
    for n, o, w, r in rows:
        print(f"| {n} | {o:.3f} | {w:.3f} | {r:.3f} |")
    to, tn = sum(r[1] for r in rows), sum(r[2] for r in rows)
    gm = math.exp(sum(math.log(r[3]) for r in rows) / len(rows))
    print(f"| **total (sum of medians)** | **{to:.3f}** | **{tn:.3f}** | "
          f"**{to/tn:.3f}** |")
    print(f"geomean speedup (old/new): {gm:.3f}")


if __name__ == "__main__":
    main()
