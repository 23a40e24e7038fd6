#!/usr/bin/env bash
# Spike adjudication: re-time the N slowest queries from a bench
# artifact in ISOLATION (one fresh JVM sweep over just those queries,
# each already min-of-2 via Bench's contention guard) and append a
# "spike_check" section comparing official vs isolated cost.
#
# Usage: scripts/bench_isolate.sh [artifact=BENCH_LOCAL.json] [N=10] [sfdir=/root/testdata/sf0.1]
#
# Output: <artifact>.spike_check.json with per-query
#   {official, isolated, ratio} — ratio >> 1 means the official number
#   embeds host contention, not engine cost.
set -euo pipefail
cd "$(dirname "$0")/.."

ARTIFACT="${1:-BENCH_LOCAL.json}"
N="${2:-10}"
SFDIR="${3:-/root/testdata/sf0.1}"

[ -f "$ARTIFACT" ] || { echo "no artifact at $ARTIFACT" >&2; exit 1; }

SLOW=$(python3 - "$ARTIFACT" "$N" <<'EOF'
import json, sys
art = json.load(open(sys.argv[1]))
qs = {k: v for k, v in art["queries"].items() if v > 0}
slow = sorted(qs, key=qs.get, reverse=True)[: int(sys.argv[2])]
print(",".join(slow))
EOF
)
echo "[isolate] re-timing: $SLOW" >&2

ISOLATED_OUT=$(mktemp /tmp/bench_isolate.XXXXXX.json)
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_ONLY="$SLOW" \
  SPARK_GRAFT_BENCH_OUT="$ISOLATED_OUT" \
  sbt -batch "runMain graft.Bench" >/dev/null

python3 - "$ARTIFACT" "$ISOLATED_OUT" <<'EOF'
import json, sys
art = json.load(open(sys.argv[1]))
iso = json.load(open(sys.argv[2]))
rows = {}
for q, t in iso["queries"].items():
    off = art["queries"].get(q, -1)
    rows[q] = {"official": off, "isolated": t,
               "ratio": round(off / t, 2) if t > 0 and off > 0 else None}
out = sys.argv[1] + ".spike_check.json"
json.dump({"spike_check": rows,
           "iso_load_before": iso.get("load_before"),
           "iso_load_after": iso.get("load_after")},
          open(out, "w"), indent=1)
print(out)
for q, r in sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0)):
    print(f"  {q:32s} official {r['official']:7.2f}s  isolated {r['isolated']:7.2f}s  ratio {r['ratio']}")
EOF
