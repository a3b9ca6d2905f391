#!/usr/bin/env python3
"""Per-query diff of two BENCH_full.json artifacts (round-over-round
comparison per the SURVEY §5 noise methodology: judge queries, not
suite totals). Dev tool only.

Usage:
  tools/bench_diff.py OLD.json NEW.json [--threshold 1.5] [--min-sec 0.5]
  tools/bench_diff.py <(git show <rev>:BENCH_full.json) BENCH_full.json
"""
import argparse
import json

p = argparse.ArgumentParser()
p.add_argument("old")
p.add_argument("new")
p.add_argument("--threshold", type=float, default=1.5,
               help="flag ratio above this (default 1.5)")
p.add_argument("--min-sec", type=float, default=0.5,
               help="ignore queries faster than this in NEW (default 0.5)")
a = p.parse_args()

old = json.load(open(a.old))
new = json.load(open(a.new))
oq, nq = old["queries"], new["queries"]
common = sorted(set(oq) & set(nq))

print(f"old: {len(oq)} queries, {old['value']:.1f}s   "
      f"new: {len(nq)} queries, {new['value']:.1f}s")
co, cn = sum(oq[q] for q in common), sum(nq[q] for q in common)
print(f"common ({len(common)}): {co:.1f}s -> {cn:.1f}s = {cn / co:.2f}x")

regs = [(q, oq[q], nq[q]) for q in common
        if nq[q] > a.threshold * oq[q] and nq[q] > a.min_sec]
if regs:
    print(f"\nslower >{a.threshold}x (and >{a.min_sec}s):")
    for q, o, n in sorted(regs, key=lambda t: -t[2] / t[1]):
        print(f"  {q:36s} {o:7.2f} -> {n:7.2f}  ({n / o:.1f}x)")
imps = [(q, oq[q], nq[q]) for q in common
        if oq[q] > a.threshold * nq[q] and oq[q] > a.min_sec]
if imps:
    print(f"\nfaster >{a.threshold}x (and were >{a.min_sec}s):")
    for q, o, n in sorted(imps, key=lambda t: -t[1] / t[2]):
        print(f"  {q:36s} {o:7.2f} -> {n:7.2f}  ({o / n:.1f}x)")

added = sorted(set(nq) - set(oq), key=lambda q: -nq[q])
if added:
    print(f"\nnew queries ({len(added)}, {sum(nq[q] for q in added):.1f}s):")
    for q in added[:15]:
        print(f"  {q:36s} {nq[q]:7.2f}")
removed = sorted(set(oq) - set(nq))
if removed:
    print(f"\nremoved: {', '.join(removed)}")
