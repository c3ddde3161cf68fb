#!/usr/bin/env bash
# Sealing-run DISTRIBUTION (VERDICT r10 item 4): N full-suite fork runs —
# each a fresh sbt-launched JVM via tools/bench_fork.sh, the only citable
# protocol — aggregated into one JSON carrying EVERY run's per-query
# median, so SURVEY claims are phrased against the spread, never a single
# run. Movers >1.3x vs last round are judged against this range.
#
# Usage: tools/bench_runs.sh [N] [sfDir] [outFile]
#   tools/bench_runs.sh 5 /root/testdata/sf0.1 BENCH_RUNS_r11.json
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-5}"
SF="${2:-/root/testdata/sf0.1}"
OUT="${3:-BENCH_RUNS_r11.json}"
for i in $(seq 1 "$N"); do
  echo "[bench_runs] sealing run $i/$N ..." >&2
  tools/bench_fork.sh "$SF" > /dev/null
  cp BENCH_LOCAL.json "/tmp/bench_run_$i.json"
done
python3 - "$N" "$OUT" <<'EOF'
import json, sys, statistics
n, out = int(sys.argv[1]), sys.argv[2]
runs = [json.load(open(f"/tmp/bench_run_{i}.json")) for i in range(1, n + 1)]
qs = sorted(runs[0]["queries"])
per = {q: sorted(r["queries"][q] for r in runs) for q in qs}
agg = {q: {"runs": per[q],
           "med": statistics.median(per[q]),
           "min": per[q][0], "max": per[q][-1]} for q in qs}
totals = sorted(round(sum(r["queries"].values()), 3) for r in runs)
# r14: per-run executor telemetry (each run's median-wall measurement) —
# an excursion inside a sealed distribution then self-attributes
telem = {q: [r.get("telemetry", {}).get(q) for r in runs] for q in qs}
doc = {"protocol": "fork (fresh JVM per run), full suite, per-run median of 3",
       "n_runs": n, "sf": runs[0]["sf"], "fixture": runs[0]["fixture"],
       "totals_med": totals, "queries": agg, "telemetry_runs": telem}
json.dump(doc, open(out, "w"), indent=1, sort_keys=True)
print(f"[bench_runs] wrote {out}: totals {totals}", file=sys.stderr)
EOF
# r15: if a prior round's seal exists, report plan-counter drift against
# it (informational here — the builder judges the output; plan_drift
# exits 1 on a DRIFT, which this report-only invocation masks with ||)
PREV=$(ls -1 BENCH_RUNS_r*.json 2>/dev/null | grep -v "$OUT" | sort | tail -1 || true)
if [ -n "$PREV" ]; then
  echo "[bench_runs] plan drift vs $PREV:" >&2
  python3 tools/plan_drift.py "$PREV" "$OUT" >&2 || true
fi
