#!/usr/bin/env bash
# Standing 10x scale gate — the per-round artifact version of the
# round-9 scale study:
#   (a) regenerate the m=1 and m=10 Heaps-law corpora with graft.ScaleGen
#       (m=1 ~ sf0.1-sized, m=10 ~ sf1-sized; Heaps vocabulary V=2000*ceil(sqrt(m))
#       is the realistic text model — the committed testdata's ~20-word
#       vocabulary makes candidate-pair text operators look quadratic
#       when the true behavior is near-linear),
#   (b) run the FULL Verify sweep at m=10 (every gated query must run
#       clean at sf1-equivalent scale — this is the gate that caught the
#       ev50 int64 overflow and the assortativity /0 in round 9),
#   (c) bench the N most expensive queries (taken from a committed bench
#       artifact) at both multipliers,
#   (d) ZIPF-SKEW section (round 11): regenerate both multipliers with
#       log-uniform hot keys (events.user_id / o_custkey / l_partkey;
#       hottest key draws ln2/ln n of ALL rows — 9.5% of events at m=1,
#       7.2% at m=10, cooling as the keyspace grows) plus boilerplate-prefixed
#       documents, verify the skew-sensitive queries run clean at m=10,
#       and bench them at both multipliers — hot-key skew is the classic
#       100TB failure mode uniform corpora never exercise,
#   (e) write SCALE_r<round>.json with per-query 1x->10x scaling
#       exponents (exp = log10(t10/t1)) for BOTH sections; if
#       SCALE_r<round-1>.json exists, append per-query diffs and FAIL on
#       any exponent worsening by more than 0.15. Every bench artifact
#       is health-checked (scripts/check_bench_health.py): failures or
#       unresolved contention re-runs (`rerun_failures`) fail the gate.
#
# Usage: scripts/scale_gate.sh <round> [topN=30] [artifact=BENCH_LOCAL.json] [base=/tmp/scale] [extraQueries]
#   extraQueries: comma-separated names benched in ADDITION to the
#   artifact's top-N (e.g. a new query not yet in any artifact).
# Exit nonzero on: verify failures at m10 (either corpus), bench-health
# failures, or an exponent regression.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: scale_gate.sh <round> [topN] [artifact] [base] [extra]}"
N="${2:-30}"
ARTIFACT="${3:-BENCH_LOCAL.json}"
BASE="${4:-/tmp/scale}"
# default extras: queries worth gating that may not crack the
# artifact's top-N — ext_ktruss (the r12 truss work's single-k probe)
# and the r12 annotation/preference/eval family, whose first gate round
# seeds the exp_diff baselines for r13+
EXTRA="${5:-ext_ktruss,ext_fleiss_kappa,ext_kripp_alpha,ext_bradley_terry,ext_condorcet_cycles,ext_rouge_pairs}"

# skew-sensitive set: hot-key join (j28), per-user sequence/window ops,
# heavy hitters, hot-segment / hot-digest / hot-bucket dedup gates;
# r12 adds the join+connected-components family (j25/ext_dedup_components
# — CC under hot keys was measured only on heaps corpora before) and
# ext_spearman (zipf mode now plants a hot TIE in l_quantity, the
# GroupedPrefix hot-tie degeneracy probe)
SKEWQ="j28_salted_join,ev4_transitions,ev5_sessions,ev8_rolling_actives,ev25_active_time,ext_heavy_hitters,ext_heavy_distinct,ext_dedup_segments,ext_dedup_exact,ext_dedup_minhash_capped,j25_er_pipeline,ext_dedup_components,ext_spearman"

[ -f "$ARTIFACT" ] || { echo "no bench artifact at $ARTIFACT" >&2; exit 1; }

echo "[scale] (a) generating Heaps corpora under $BASE" >&2
for m in 1 10; do
  sbt -batch "runMain graft.ScaleGen $BASE/h$m $m heaps" >/dev/null
done

echo "[scale] (b) full Verify sweep at m=10" >&2
rm -rf "$BASE/verify_h10"
sbt -batch "runMain graft.Verify $BASE/h10 $BASE/verify_h10" >/dev/null
python3 - "$BASE/verify_h10" <<'EOF'
import glob, json, os, sys
out = sys.argv[1]
failed = json.load(open(f"{out}/_failed.json"))
n = len([p for p in glob.glob(f"{out}/*") if os.path.isdir(p)])
print(f"[scale] verify@m10: {n} query dumps, {len(failed)} failures", file=sys.stderr)
if failed:
    for k, v in failed.items():
        print(f"[scale]   FAIL {k}: {v[:200]}", file=sys.stderr)
    sys.exit(1)
EOF

SLOW=$(python3 - "$ARTIFACT" "$N" <<'EOF'
import json, sys
art = json.load(open(sys.argv[1]))
qs = {k: v for k, v in art["queries"].items() if v > 0}
print(",".join(sorted(sorted(qs, key=qs.get, reverse=True)[: int(sys.argv[2])])))
EOF
)
if [ -n "$EXTRA" ]; then SLOW="$SLOW,$EXTRA"; fi
echo "[scale] (c) benching top-$N at m=1 and m=10: $SLOW" >&2
for m in 1 10; do
  SPARK_GRAFT_SF_DIR="$BASE/h$m" SPARK_GRAFT_ONLY="$SLOW" \
    SPARK_GRAFT_BENCH_OUT="$BASE/bench_h$m.json" \
    sbt -batch "runMain graft.Bench" >/dev/null
done

echo "[scale] (d) zipf-skew corpora + skew-sensitive verify/bench" >&2
for m in 1 10; do
  sbt -batch "runMain graft.ScaleGen $BASE/z$m $m zipf" >/dev/null
done
# FULL sweep at zipf-m10 (r11 ran it once manually: 371/371 clean) —
# every operator must survive the hot-key corpus, not just the ten
# benched skew queries
rm -rf "$BASE/verify_z10"
sbt -batch "runMain graft.Verify $BASE/z10 $BASE/verify_z10" >/dev/null
python3 - "$BASE/verify_z10" <<'EOF'
import glob, json, os, sys
out = sys.argv[1]
failed = json.load(open(f"{out}/_failed.json"))
n = len([p for p in glob.glob(f"{out}/*") if os.path.isdir(p)])
print(f"[scale] verify@zipf-m10: {n} query dumps, {len(failed)} failures", file=sys.stderr)
if failed:
    for k, v in failed.items():
        print(f"[scale]   FAIL {k}: {v[:200]}", file=sys.stderr)
    sys.exit(1)
EOF
# RERUN_SEC=0: every skew query is timed twice and the min recorded —
# the skew set's walls are small (0.3–10 s), where one cache-polluted
# run swings an exponent by ±0.3 (r12 measured ev4_transitions' m10
# at 1.0–2.5 s across identical idle runs)
for m in 1 10; do
  SPARK_GRAFT_SF_DIR="$BASE/z$m" SPARK_GRAFT_ONLY="$SKEWQ" \
    SPARK_GRAFT_RERUN_SEC=0 \
    SPARK_GRAFT_BENCH_OUT="$BASE/bench_z$m.json" \
    sbt -batch "runMain graft.Bench" >/dev/null
done

echo "[scale] bench-artifact health (failures / unresolved re-runs)" >&2
python3 scripts/check_bench_health.py \
  "$BASE/bench_h1.json" "$BASE/bench_h10.json" \
  "$BASE/bench_z1.json" "$BASE/bench_z10.json"

echo "[scale] (e) writing SCALE_r${ROUND}.json" >&2
# extracted to its own script (r12) so the exponent-regression gate —
# heaps AND zipf-skew sections — is testable against planted inputs
python3 scripts/scale_aggregate.py "$ROUND" "$BASE"
echo "[scale] gate green" >&2
