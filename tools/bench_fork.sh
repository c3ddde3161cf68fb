#!/usr/bin/env bash
# Fork-protocol bench: reproduces the driver's measurement shape exactly —
# a FRESH sbt-launched JVM per invocation, full warmup pass, then three
# measured runs per query with median+min reported (graft.Bench).
# This is the ONLY citable source for performance claims (VERDICT r8 #2);
# in-session / warm-REPL timings diverge from driver numbers and must not
# be quoted in SURVEY.md or commit messages.
#
# Usage: tools/bench_fork.sh [sfDir] [comma-separated query filter]
#   tools/bench_fork.sh /root/testdata/sf0.1 p02_minhash_lsh_dedup,p16_simhash_neardup
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
ONLY="${2:-}"
export SPARK_GRAFT_SF_DIR="$SF"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
if [ -n "$ONLY" ]; then export SPARK_GRAFT_BENCH_ONLY="$ONLY"; fi
sbt -batch "runMain graft.Bench" 2>&1 | tail -2
