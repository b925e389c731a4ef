#!/usr/bin/env python3
"""Diff two bench per-query JSON maps: sorted by delta, with totals.
Usage: benchdiff.py OLD.json NEW.json [min_abs_delta]"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
oq, nq = old["queries"], new["queries"]
rows = [(nq[k] - oq[k], k, oq[k], nq[k]) for k in nq if k in oq]
rows.sort()
print(f"total {old['value']:.1f} -> {new['value']:.1f} "
      f"({new['value']-old['value']:+.1f} s)")
for d, k, o, n in rows:
    if abs(d) >= thr:
        print(f"{k:35s} {o:7.2f} -> {n:7.2f}  {d:+.2f}")
