#!/usr/bin/env python3
"""Merge NEW keys' pins into BASELINE_BENCH.json from a pin run.

The pinned baseline is extended, never rewritten: existing pins stay
byte-identical (re-pinning to a faster/slower box would silently move
the goalposts the judge grades against), and only keys ABSENT from the
baseline are added from the pin run's per-query map. Run the pin run
with SPARK_GRAFT_STAT=median SPARK_GRAFT_PASSES=3 (the pin statistic).

Usage:
  tools/extend_baseline.py PIN_RUN.json [--baseline BASELINE_BENCH.json]
"""
import argparse
import json

p = argparse.ArgumentParser()
p.add_argument("pin_run")
p.add_argument("--baseline", default="BASELINE_BENCH.json")
a = p.parse_args()

base = json.load(open(a.baseline))
run = json.load(open(a.pin_run))
if run.get("stat") != "median-of-3":
    raise SystemExit(f"pin run stat is {run.get('stat')!r}; "
                     "re-run with SPARK_GRAFT_STAT=median SPARK_GRAFT_PASSES=3")
added = {k: v for k, v in run["queries"].items()
         if k not in base["queries"] and v >= 0}
base["queries"].update(added)
base["value"] = round(sum(base["queries"].values()), 3)
json.dump(base, open(a.baseline, "w"), indent=None, separators=(",", ":"))
open(a.baseline, "a").write("\n")
print(f"added {len(added)} pins: {sorted(added)}")
print(f"baseline now {len(base['queries'])} keys, total {base['value']:.1f}s")
