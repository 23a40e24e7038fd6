#!/usr/bin/env python3
"""Fail (exit 1) if a Bench artifact records query failures OR
contention re-runs that STILL failed (`rerun_failures`): a scale/bench
gate must not pass on an artifact whose numbers silently exclude broken
or flaky queries. Usage: check_bench_health.py <bench.json> [...]"""
import json
import sys

bad = []
for path in sys.argv[1:]:
    art = json.load(open(path))
    failures = art.get("failures", 0)
    rerun = art.get("rerun_failures", [])
    neg = [q for q, t in art.get("queries", {}).items() if t is not None and t < 0]
    if failures or rerun or neg:
        bad.append((path, failures, rerun, neg))
for path, failures, rerun, neg in bad:
    print(f"[bench-health] {path}: failures={failures} "
          f"rerun_failures={rerun} negative_times={neg}", file=sys.stderr)
sys.exit(1 if bad else 0)
