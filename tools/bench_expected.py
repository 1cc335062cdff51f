#!/usr/bin/env python3
"""Mint BENCH_EXPECTED.json from a cold-store driver-shape bench run.

Usage: python3 tools/bench_expected.py [BENCH_DETAIL.json] [BENCH_EXPECTED.json]

Reads the per-query median walls from the detail file the builder's own
cold run wrote and commits them as the expectation baseline the NEXT
bench run (including the driver's) compares against: a query observed at
> max(3x expected, expected + 2 s) self-identifies in BENCH_DETAIL.json's
"anomalies_obs_vs_expected" map (see Bench.scala). Regenerate each round
from a fresh-artifact CPUS=32 run so the expectations track the code.
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "BENCH_EXPECTED.json"

detail = json.load(open(src))
queries = detail["queries"]
expected = {k: round(v, 2) for k, v in sorted(queries.items())}
with open(dst, "w") as f:
    json.dump(expected, f, indent=0, sort_keys=True)
    f.write("\n")
print(f"wrote {dst}: {len(expected)} expectations from {src} "
      f"(sf={detail.get('sf')}, runs={detail.get('runs_per_query')})")
