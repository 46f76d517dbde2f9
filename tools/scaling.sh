#!/bin/bash
# 4-point scaling curve (north-rule evidence): one JVM per level —
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
# After the four levels, the FIRST level runs again as a CONTROL leg:
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
# OOM-killed benches). Purge anything stale before timing.
find "$SPARK_GRAFT_LOCAL_DIR" -mindepth 1 -maxdepth 1 -mmin +60 -exec rm -rf {} + 2>/dev/null || true
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
  line=$(SPARK_GRAFT_SCALE_PARTS=${SPARK_GRAFT_SCALE_PARTS:-128} \
    sbt -batch "runMain graft.ScalingBench $c $STRATEGY" 2>/dev/null | grep -o 'LEVEL .*')
  if [ "$n" -gt "$NLEVELS" ]; then echo "${line/LEVEL/CONTROL}"; else echo "$line"; fi
done
