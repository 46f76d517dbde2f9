#!/bin/bash
# Multi-point scaling curve (north-rule evidence; default 4 levels,
# SPARK_GRAFT_SCALE_LEVELS overrides): one JVM per level —
# same-JVM runs inherit each other's GC/JIT state — all levels run
# back-to-back in ONE session so they share a host-steal regime, and
# each LEVEL line carries its own regime markers: CPU steal
# (Bench.calibrate) and memory fabric (Bench.calibrateMem).
#
#   LEVEL <cores> <buildSec> <filesPerSec> <queryBatchSec> <calibSec>
#         <memCalibSec> <inputMB> <shufWriteMB> <shufReadMB> <spillMB>
#
# The four MB fields are the timed build's task-metric deltas
# (BuildTraffic): plan properties, flat across regimes — the wall-
# independent check that every level ran the identical job.
#
# After the levels, the FIRST level runs again as a CONTROL leg:
# matched calibration markers are necessary but NOT sufficient for
# cross-leg comparability on this host (measured: 211 s vs 337 s on
# identical 4-core legs an hour apart, markers flat — BENCH.md r4).
# If CONTROL diverges >20% from its LEVEL twin, the curve's shape is
# host drift, not engine scaling — discard it.
#
# Usage: tools/scaling.sh [docs] [docIdStrategy]   (default 80000 keyRange)
# SPARK_GRAFT_SCALE_LEVELS overrides the core levels (space-separated,
# default "4 8 16 32"); the control leg is always a repeat of the FIRST
# level. A shorter list (e.g. "8 16 32") halves the drift window — both
# discarded scan curves lost their 4-core anchor to drift while the
# 8/16/32 triplet stayed consistent.
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_LOCAL_DIR=${SPARK_GRAFT_LOCAL_DIR:-/dev/shm/spark-tmp}
mkdir -p "$SPARK_GRAFT_LOCAL_DIR"
# A KILLED Spark run leaks its shuffle dirs into tmpfs forever; tmpfs
# pages count against host RAM, so leftovers silently starve every
# later leg (measured: 106 GB of stale blockmgr dirs -> 18 GB free ->
# OOM-killed benches). Purge anything stale before timing — but ONLY
# dirs that are dead by BOTH signals (the CLAUDE.md rule is "when no
# Spark job is live"): nothing fresh within two levels of depth (a
# live job keeps writing into its blockmgr hash subdirs, while the TOP
# dir's mtime freezes after the early burst), and no live bench JVM at
# all. A >60-min leg under a running graft.* JVM must not lose its
# shuffle files mid-job to a concurrently started curve.
if ! pgrep -f 'graft\.[A-Z][A-Za-z]*Bench|graft\.Bench|graft\.Verify' > /dev/null 2>&1; then
  for d in "$SPARK_GRAFT_LOCAL_DIR"/*; do
    [ -e "$d" ] || continue
    if [ -z "$(find "$d" -maxdepth 2 -mmin -60 -print -quit 2>/dev/null)" ]; then
      rm -rf "$d" 2>/dev/null || true
    fi
  done
fi
export SPARK_GRAFT_SCALE_DOCS=${1:-${SPARK_GRAFT_SCALE_DOCS:-80000}}
STRATEGY=${2:-keyRange}
# fail fast on typos ("Scan", "key-range"): ScalingBench also validates,
# but catching it here avoids burning a 4-leg run on the wrong strategy
case "$STRATEGY" in keyRange|scan) ;; *)
  echo "unknown docIdStrategy '$STRATEGY' (keyRange | scan)" >&2; exit 1;; esac
LEVELS=${SPARK_GRAFT_SCALE_LEVELS:-"4 8 16 32"}
FIRST=$(set -- $LEVELS; echo "$1")
NLEVELS=$(set -- $LEVELS; echo "$#")
n=0
for c in $LEVELS $FIRST; do
  # sbt prefixes forked stdout with [info]; match the payload anywhere.
  # Pin SPARK_GRAFT_SCALE_PARTS so every level runs the IDENTICAL job
  # (otherwise partitions scale with cores and low levels get corpus-
  # sized partitions that blow the heap at 8M files).
  # The trailing repeat of the first level is the CONTROL leg (see
  # header); its line is renamed so parsers don't mistake it for a
  # fifth curve point.
  n=$((n + 1))
  # capture the full leg output: a failed leg (OOM-killed JVM, sbt
  # error) must name itself and point at its log instead of aborting a
  # multi-hour curve with zero diagnostics or — worse — passing a
  # partial line through as a curve point
  LOG=$(mktemp /tmp/scaling-leg-XXXXXX.log)
  if ! SPARK_GRAFT_SCALE_PARTS=${SPARK_GRAFT_SCALE_PARTS:-128} \
      sbt -batch "runMain graft.ScalingBench $c $STRATEGY" > "$LOG" 2>&1; then
    echo "FAILED leg cores=$c strategy=$STRATEGY — log: $LOG" >&2
    exit 1
  fi
  line=$(grep -o 'LEVEL .*' "$LOG" || true)
  if [ -z "$line" ]; then
    echo "FAILED leg cores=$c: no LEVEL line emitted — log: $LOG" >&2
    exit 1
  fi
  rm -f "$LOG"
  if [ "$n" -gt "$NLEVELS" ]; then echo "${line/LEVEL/CONTROL}"; else echo "$line"; fi
done
