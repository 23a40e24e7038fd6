#!/usr/bin/env python3
"""Bench-artifact health gate.

Base mode — fail (exit 1) if a Bench artifact records query failures OR
contention re-runs that STILL failed (`rerun_failures`): a scale/bench
gate must not pass on an artifact whose numbers silently exclude broken
or flaky queries.

Regression mode (r12, `--prev`) — additionally diff per-query times
against a previous-round artifact and fail on any query that got
> RATIO_MAX slower while costing more than ABS_MIN seconds now, unless
it has an entry in the committed exceptions file (a machine-readable
version of the "bought deliberately, stash-A/B measured" note — r11's
GroupedPrefix constants were only surfaced by voluntary honesty; this
makes silence impossible).

Usage: check_bench_health.py <bench.json> [...]
           [--prev <prev.json>] [--exceptions <exceptions.json>]
`--prev` applies to the FIRST artifact. The exceptions file maps
query name -> reason string (see scripts/bench_exceptions.json).
"""
import json
import sys

RATIO_MAX = 1.5
ABS_MIN = 1.0


def parse_args(argv):
    paths, prev, exc = [], None, None
    i = 0
    while i < len(argv):
        if argv[i] == "--prev":
            prev = argv[i + 1]
            i += 2
        elif argv[i] == "--exceptions":
            exc = argv[i + 1]
            i += 2
        else:
            paths.append(argv[i])
            i += 1
    return paths, prev, exc


def main(argv):
    paths, prev_path, exc_path = parse_args(argv)
    bad = []
    for path in paths:
        art = json.load(open(path))
        failures = art.get("failures", 0)
        rerun = art.get("rerun_failures", [])
        neg = [q for q, t in art.get("queries", {}).items()
               if t is not None and t < 0]
        if failures or rerun or neg:
            bad.append((path, failures, rerun, neg))
    for path, failures, rerun, neg in bad:
        print(f"[bench-health] {path}: failures={failures} "
              f"rerun_failures={rerun} negative_times={neg}",
              file=sys.stderr)

    regressions = []
    if prev_path and paths:
        cur = json.load(open(paths[0])).get("queries", {})
        prev = json.load(open(prev_path)).get("queries", {})
        exceptions = json.load(open(exc_path)) if exc_path else {}
        exceptions.pop("_doc", None)
        for q, t_now in sorted(cur.items()):
            t_prev = prev.get(q)
            if t_prev is None or t_prev <= 0 or t_now is None or t_now <= 0:
                continue
            if t_now > ABS_MIN and t_now / t_prev > RATIO_MAX:
                if q in exceptions:
                    print(f"[bench-health] {q}: {t_prev:.2f}s -> "
                          f"{t_now:.2f}s ({t_now / t_prev:.2f}x) — excepted: "
                          f"{exceptions[q]}", file=sys.stderr)
                else:
                    regressions.append((q, t_prev, t_now))
        for q, t_prev, t_now in regressions:
            print(f"[bench-health] REGRESSION {q}: {t_prev:.2f}s -> "
                  f"{t_now:.2f}s ({t_now / t_prev:.2f}x > {RATIO_MAX}x, "
                  f"> {ABS_MIN}s) — fix it or add a measured-trade entry "
                  f"to the exceptions file", file=sys.stderr)
    return 1 if (bad or regressions) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
