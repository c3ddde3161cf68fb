#!/usr/bin/env python3
"""Round-over-round plan-counter drift check (the enforcement half of
VERDICT r14 item 6).

Usage: python3 tools/plan_drift.py <BENCH_RUNS_old.json> <BENCH_RUNS_new.json>

Bench telemetry carries each measured run's scan-planning counters
(files_planned, entries_considered, skipped_by_partition/metrics,
manifests). Those counters are DETERMINISTIC for a fixed tree + fixture
once an artifact-building query reaches its steady state, so comparing
two sealed runs mechanically answers the question the r14 judge had to
audit by hand: did any query's scans start planning more files for the
same answers?

The load-bearing distinction: a query whose files_planned is CONSTANT
across every run inside a seal has a deterministic plan, and a change
of that constant between two seals is a plan change — the regression
signal. A query whose files_planned varies WITHIN a seal is a
census-cadence line (m02's documented unbounded census drift, m06's
eq-delete accumulation — the artifact grows between a JVM's runs by
design); its cross-seal delta is growth phase, not plan, so it reports
as CADENCE (informational). m07/m08 prove the point from the other
side: their compaction returns the artifact to a fixed layout every
cycle, so they read constant-within-seal AND equal-across-seals.

  DRIFT    files_planned constant within both seals, but changed
  NEWSCAN  a query whose scans appeared/disappeared (plan_scans 0 <-> N)
  CADENCE  files_planned varies within a seal (expected; listed with
           its per-run values for the anatomy notes)

Exit status: 1 if any DRIFT/NEWSCAN on a query present in both files,
else 0.
"""
import sys, json
from collections import Counter

COUNTERS = ("plan_scans", "manifests_total", "manifests_skipped",
            "entries_considered", "skipped_by_partition",
            "skipped_by_metrics", "files_planned")


def consensus(runs, key):
    vals = [r.get(key) for r in runs if key in r]
    if not vals:
        return None, True
    c = Counter(vals).most_common()
    return c[0][0], len(c) == 1  # value, constant-within-seal


def load(path):
    with open(path) as f:
        d = json.load(f)
    t = d.get("telemetry_runs")
    if not isinstance(t, dict):
        sys.exit(f"{path}: no telemetry_runs block (pre-r14 seal?)")
    return t


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    shared = sorted(set(old) & set(new))
    drifts, cadence = [], []
    compared = uncompared = 0
    for q in shared:
        osc, _ = consensus(old[q], "plan_scans")
        nsc, _ = consensus(new[q], "plan_scans")
        if osc is not None and nsc is not None and (osc == 0) != (nsc == 0):
            drifts.append(("NEWSCAN", q, "plan_scans", osc, nsc))
            continue
        ov, oconst = consensus(old[q], "files_planned")
        nv, nconst = consensus(new[q], "files_planned")
        if ov is None or nv is None:
            uncompared += 1
            continue
        compared += 1
        if not (oconst and nconst):
            if ov != nv or not nconst:
                cadence.append(
                    (q, [r.get("files_planned") for r in new[q]]))
        elif ov != nv:
            drifts.append(("DRIFT", q, "files_planned", ov, nv))
    for kind, q, key, ov, nv in drifts:
        print(f"{kind}  {q}: {key} {ov} -> {nv}")
    for q, vals in cadence:
        print(f"CADENCE  {q}: files_planned per new-seal run {vals}")
    print(f"{len(shared)} shared queries, {compared} compared; "
          f"{len(drifts)} drift(s), {len(cadence)} cadence line(s)")
    if uncompared:
        # no silent caps: a seal without plan counters (pre-r15) compares
        # NOTHING for those queries — say so instead of reading as clean
        print(f"WARNING: {uncompared} shared quer(ies) carry no "
              "files_planned on one side (pre-plan-counter seal?) — "
              "those were NOT checked")
    sys.exit(1 if drifts else (2 if compared == 0 and shared else 0))


if __name__ == "__main__":
    main()
