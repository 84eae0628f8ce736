#!/usr/bin/env bash
# Preflight for bench/sweep runs — guards against the two r15 sf3
# campaign hazards (SCALE.md r15, VERDICT r15 #5):
#
#  1. A crashed Spark run strands tens of GB of shuffle scratch in
#     /tmp/blockmgr-* and /tmp/spark-*. When NO Spark/sbt JVM is live,
#     every such dir is stale by definition and is removed here.
#     (If a JVM is live we cannot safely map dirs to owners — cleanup
#     is skipped with a note.)
#  2. A big-shuffle run that exceeds free disk dies hours in, mid-spill.
#     Fail loudly BEFORE starting when free space on /tmp's filesystem
#     is under the floor.
#
# Usage: disk_preflight.sh [floor_gb]   (default floor: 40 GB)
# Exit:  0 = clear to run; 1 = below floor (message on stderr).
set -u
FLOOR_GB="${1:-40}"

live=$(pgrep -f 'org.apache.spark|sbt-launch|graft\.(Bench|Verify|PairSweep|GeneralSweep)' | wc -l)
if [ "$live" -eq 0 ]; then
  stale=$(find /tmp -maxdepth 1 \( -name 'blockmgr-*' -o -name 'spark-*' \) 2>/dev/null)
  if [ -n "$stale" ]; then
    sz=$(du -shc $stale 2>/dev/null | tail -1 | cut -f1)
    echo "[preflight] removing stale Spark scratch ($sz): $(echo "$stale" | tr '\n' ' ')" >&2
    rm -rf $stale
  fi
else
  echo "[preflight] $live Spark/sbt JVM(s) live — skipping scratch cleanup" >&2
fi

avail_gb=$(df -BG --output=avail /tmp | tail -1 | tr -dc '0-9')
if [ "$avail_gb" -lt "$FLOOR_GB" ]; then
  echo "[preflight] FAIL: ${avail_gb}G free on /tmp < ${FLOOR_GB}G floor —" \
       "a big-shuffle run would die mid-spill. Free disk or lower the floor." >&2
  exit 1
fi
echo "[preflight] OK: ${avail_gb}G free >= ${FLOOR_GB}G floor" >&2
