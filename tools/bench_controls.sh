#!/usr/bin/env bash
# r13 divergence controls (VERDICT r12 item 1): reproduce-or-rule-out the
# driver machine's +0.15-0.2 s excursions on the sub-0.5 s plan-pinned
# queries (i02/i11) with two named environment knobs, measured on the
# sub-second fixed-overhead class {i01,i02,i11,p34,p44}:
#   baseline : N fork runs, untouched machine
#   coldcache: same, but `sync; echo 3 > /proc/sys/vm/drop_caches` before
#              every fork run (parquet footers + sbt/jar pages re-read
#              from disk — the "driver just built the tree" shape)
#   loadeddisk: same, with a background fsync-ing writer hammering the
#              block-manager/warehouse filesystem for the whole run
#   throttled : run the bench JVM inside a blkio cgroup (v1) capping the
#              block device at 20 MB/s read+write; requires root, a
#              cgroup-v1 blkio controller, and the device's MAJ:MIN
#              (default 254:0, override via BENCH_BLKDEV=MAJ:MIN)
# Usage: tools/bench_controls.sh <baseline|coldcache|loadeddisk|throttled> [runs]
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:?mode}"
RUNS="${2:-5}"
BLKDEV="${BENCH_BLKDEV:-254:0}"
SUBSET="i01_iceberg_full_scan,i02_iceberg_pruned_scan,i11_dsv2_filter_pushdown,p34_asof_join,p44_unigram_perplexity"
OUT="BENCH_CONTROL_${MODE}.jsonl"
: > "$OUT"
LOADPID=""
cleanup() { [ -n "$LOADPID" ] && kill "$LOADPID" 2>/dev/null || true; }
trap cleanup EXIT
if [ "$MODE" = "throttled" ]; then
  if [ ! -d /sys/fs/cgroup/blkio ]; then
    echo "[controls] throttled mode needs a cgroup-v1 blkio controller" >&2
    echo "[controls] (/sys/fs/cgroup/blkio absent — cgroup-v2-only host?)" >&2
    exit 2
  fi
  if [ "$(id -u)" != 0 ]; then
    echo "[controls] throttled mode needs root (cgroup writes + drop_caches)" >&2
    exit 2
  fi
  CG=/sys/fs/cgroup/blkio/graftbench
  mkdir -p "$CG"
  echo "$BLKDEV 20971520" > "$CG/blkio.throttle.read_bps_device"
  echo "$BLKDEV 20971520" > "$CG/blkio.throttle.write_bps_device"
fi
if [ "$MODE" = "loadeddisk" ]; then
  ( while true; do
      dd if=/dev/zero of=/tmp/.graft_loadgen bs=4M count=64 conv=fsync 2>/dev/null
      rm -f /tmp/.graft_loadgen
    done ) &
  LOADPID=$!
fi
for i in $(seq 1 "$RUNS"); do
  if [ "$MODE" = "coldcache" ]; then sync; echo 3 > /proc/sys/vm/drop_caches; fi
  if [ "$MODE" = "throttled" ]; then
    sync; echo 3 > /proc/sys/vm/drop_caches  # throttle only bites uncached reads
    sh -c 'echo $$ > /sys/fs/cgroup/blkio/graftbench/cgroup.procs; exec tools/bench_fork.sh /root/testdata/sf0.1 '"$SUBSET" 2>&1 | grep '^{' >> "$OUT"
  else
    tools/bench_fork.sh /root/testdata/sf0.1 "$SUBSET" 2>&1 | grep '^{' >> "$OUT"
  fi
  echo "[controls] $MODE run $i/$RUNS done" >&2
done
# mode 'throttled': run the bench JVM inside a blkio cgroup capping vda
# at 20 MB/s read+write (the literal "throttled mount" control) — set up
# by the caller writing blkio.throttle.{read,write}_bps_device; this
# script only moves the fork into the cgroup via cgexec-less sh -c.
