#!/usr/bin/env python3
"""Aggregate scale-gate bench artifacts into SCALE_r<N>.json and FAIL
(exit 1) on scaling-exponent regressions vs the previous round — for
BOTH the heaps section and the zipf-skew section (a skew regression is
the same 100TB failure mode, it must gate the same way).

Extracted from scale_gate.sh step (e) in r12 so the regression gate is
testable in isolation: plant a doctored prev file / bench artifact and
assert the nonzero exit (see ROUND_NOTES r12).

Usage: scale_aggregate.py <round> <base> [prev] [out]
  <base>  dir containing bench_{h,z}{1,10}.json
  [prev]  previous round artifact (default SCALE_r{round-1:02d}.json
          relative to CWD; pass /dev/null to skip the diff)
  [out]   output path (default SCALE_r{round:02d}.json)
"""
import json
import math
import os
import sys


def section(base, tag):
    b1 = json.load(open(f"{base}/bench_{tag}1.json"))
    b10 = json.load(open(f"{base}/bench_{tag}10.json"))
    rows = {}
    for q, t1 in sorted(b1["queries"].items()):
        t10 = b10["queries"].get(q, -1)
        if t1 <= 0 or t10 <= 0:
            rows[q] = {"t_m1": t1, "t_m10": t10, "ratio": None, "exp": None}
            continue
        ratio = t10 / t1
        rows[q] = {"t_m1": round(t1, 3), "t_m10": round(t10, 3),
                   "ratio": round(ratio, 2), "exp": round(math.log10(ratio), 2)}
    host = {"m1": {k: b1.get(k) for k in ("warmup_sec", "load_before", "load_after")},
            "m10": {k: b10.get(k) for k in ("warmup_sec", "load_before", "load_after")}}
    return rows, host


def diff_section(rows, prev_rows, label, regressions, notes,
                 threshold=0.15):
    """A regression needs BOTH the exponent to worsen >threshold AND the
    m10 wall itself to have grown (>1.3x and >2s now): an exponent can
    "regress" purely because the m1 DENOMINATOR shrank (r12 case: the
    hot-tie zipf column compresses lineitem harder, so scan-dominated m1
    runs got faster while m10 walls were flat), and sub-2s m10 walls are
    cache-state noise (measured: ev4_transitions m10 spans 1.0-2.5s
    across identical idle-host runs). A genuine exponent regression
    >0.15 at 10x scale implies m10 grew >=1.41x with m1 fixed, so the
    wall condition barely weakens the gate where it matters."""
    out = {}
    for q, r in rows.items():
        p = prev_rows.get(q)
        if p and p.get("exp") is not None and r.get("exp") is not None:
            d = round(r["exp"] - p["exp"], 2)
            out[q] = d
            wall_grew = (r["t_m10"] > 2.0 and
                         r["t_m10"] > 1.3 * p["t_m10"])
            if d > threshold and wall_grew:
                regressions.append(
                    f"{label}{q}: exp {p['exp']} -> {r['exp']} (+{d}), "
                    f"m10 {p['t_m10']}s -> {r['t_m10']}s")
            elif d > threshold:
                note = (f"{label}{q}: exp {p['exp']} -> {r['exp']} (+{d}) "
                        f"but m10 wall {p['t_m10']}s -> {r['t_m10']}s did "
                        f"not grow >1.3x/>2s - m1-denominator or cache "
                        f"artifact, not a scale regression")
                notes.append(note)
                print(f"[scale] NOTE {note}", file=sys.stderr)
    return out


def main(argv):
    rnd, base = int(argv[1]), argv[2]
    prev_path = argv[3] if len(argv) > 3 else f"SCALE_r{rnd - 1:02d}.json"
    out_path = argv[4] if len(argv) > 4 else f"SCALE_r{rnd:02d}.json"
    rows, host = section(base, "h")
    zrows, zhost = section(base, "z")
    out = {"round": rnd, "corpus": "heaps", "multipliers": [1, 10],
           "queries": rows, "host": host,
           "skew": {"corpus": "zipf (log-uniform hot keys s~1, "
                              "boilerplate-prefixed docs)",
                    "queries": zrows, "host": zhost}}
    regressions = []
    notes = []
    if os.path.exists(prev_path) and os.path.getsize(prev_path) > 0:
        prev = json.load(open(prev_path))
        out["exp_diff_vs_prev"] = diff_section(
            rows, prev.get("queries", {}), "", regressions, notes)
        out["skew"]["exp_diff_vs_prev"] = diff_section(
            zrows, prev.get("skew", {}).get("queries", {}), "[skew] ",
            regressions, notes)
        out["regressions"] = regressions
        out["exp_diff_notes"] = notes
    json.dump(out, open(out_path, "w"), indent=1)
    print(out_path)
    for tag, rr in (("heaps", rows), ("zipf ", zrows)):
        for q, r in sorted(rr.items(), key=lambda kv: -(kv[1]["exp"] or -99)):
            print(f"  [{tag}] {q:32s} m1 {r['t_m1']:>8}s  "
                  f"m10 {r['t_m10']:>8}s  exp {r['exp']}")
    if regressions:
        print("EXPONENT REGRESSIONS (>0.15):", file=sys.stderr)
        for r in regressions:
            print(f"  {r}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
