#!/usr/bin/env python3
"""Scale-sweep exponent report over graft.Bench BENCH_FULL artifacts.

Usage:
  python3 tools/scale_report.py x1.json K_A=a.json [K_B=b.json ...]

Each per-query exponent is log(t_xK / t_x1) / log K between the x1 run
and the LARGEST K provided (endpoints; mid columns shown for context).
Queries with t_xK below CUT seconds are fixed-overhead-dominated and
excluded from the table (their exponents are noise by construction).
Prints a markdown table sorted by exponent, plus warmup-wall slopes.
"""
import json
import math
import sys

CUT = 1.0

x1 = json.load(open(sys.argv[1]))
runs = []  # (K, data)
for a in sys.argv[2:]:
    k, path = a.split("=", 1)
    runs.append((int(k), json.load(open(path))))
runs.sort()
kmax, dmax = runs[-1]

q1, qm = x1["queries"], dmax["queries"]
rows = []
for name in sorted(q1):
    if name not in qm or qm[name] < CUT:
        continue
    exp = math.log(qm[name] / q1[name]) / math.log(kmax) if q1[name] > 0 else float("nan")
    mids = [r[1]["queries"].get(name) for r in runs[:-1]]
    rows.append((name, q1[name], mids, qm[name], exp))
rows.sort(key=lambda r: -r[4])

midhdr = " | ".join(f"x{k} (s)" for k, _ in runs[:-1])
print(f"| query | x1 (s) | {midhdr} | x{kmax} (s) | exp |")
print("|---|" + "---|" * (len(runs) + 2))
for name, t1, mids, tm, exp in rows:
    midcols = " | ".join("-" if m is None else f"{m:.2f}" for m in mids)
    print(f"| {name} | {t1:.2f} | {midcols} | {tm:.2f} | {exp:.2f} |")

print()
tot1 = sum(q1.values())
print(f"x1: total {x1['value']:.1f} s, warmup wall {x1['warmup_wall']:.1f} s, "
      f"query-median sum {tot1:.1f} s")
for k, d in runs:
    tot = sum(d["queries"].values())
    wexp = math.log(d["warmup_wall"] / x1["warmup_wall"]) / math.log(k)
    texp = math.log(tot / tot1) / math.log(k)
    print(f"x{k}: total {d['value']:.1f} s, warmup wall {d['warmup_wall']:.1f} s "
          f"(exp {wexp:.2f}), query-median sum {tot:.1f} s (exp {texp:.2f})")
print()
print("per-chain warmup:")
for chain in sorted(x1.get("warmup", {})):
    line = f"  {chain}: x1 {x1['warmup'][chain]:.1f} s"
    for k, d in runs:
        w = d.get("warmup", {}).get(chain)
        if w is not None:
            e = math.log(w / x1["warmup"][chain]) / math.log(k)
            line += f", x{k} {w:.1f} s (exp {e:.2f})"
    print(line)
