#!/usr/bin/env python3
"""Per-entry scaling exponents from two same-sitting bench artifacts.

Usage: tools/sf1_exponents.py <sf0.1_full.json> <sf1_full.json> [flag_threshold]

exponent = log10(t_sf1 / t_sf0.1)  (data grows 10x between the laps).
Prints a markdown table sorted by exponent desc and flags entries above the
threshold (default 1.05).
"""
import json
import math
import sys

a = json.load(open(sys.argv[1]))["queries"]
b = json.load(open(sys.argv[2]))["queries"]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.05
common = sorted(set(a) & set(b), key=lambda k: -(b[k] / max(a[k], 1e-9)))
rows = []
flagged = []
for k in common:
    ratio = b[k] / max(a[k], 1e-9)
    exp = math.log10(max(ratio, 1e-9))
    rows.append((k, a[k], b[k], ratio, exp))
    if exp > thr:
        flagged.append(k)
print(f"| entry | sf0.1 s | sf1 s | ratio | exponent |")
print(f"|---|---|---|---|---|")
for k, ta, tb, r, e in rows:
    mark = " **FLAG**" if e > thr else ""
    print(f"| {k}{mark} | {ta:.2f} | {tb:.2f} | {r:.2f}x | {e:.2f} |")
if rows:
    exps = sorted(e for *_, e in rows)
    print(f"\nentries: {len(rows)}  median exponent: {exps[len(exps)//2]:.2f}  "
          f"p90: {exps[int(len(exps)*0.9)]:.2f}  flagged(>{thr}): {flagged or 'none'}")
else:
    print("\nno common entries between the two bench artifacts — nothing to compare")
