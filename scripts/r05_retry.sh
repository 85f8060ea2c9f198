#!/bin/bash
# Retry the round-5 arms the flaky tunnel killed (PERF.md round-5 incident
# log): each arm resumes from its latest checkpoint, up to 3 attempts.
# Usage: bash scripts/r05_retry.sh "<quality_bench args...>" [more arms...]
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=runs/r05_queue.log

retry() {
  for i in 1 2 3; do
    echo "=== $(date +%H:%M:%S) attempt $i: $*" | tee -a "$LOG"
    if timeout 5400 python scripts/quality_bench.py $* >> "$LOG" 2>&1; then
      echo "=== ok $(date +%H:%M:%S)" | tee -a "$LOG"
      return 0
    fi
    echo "=== failed (attempt $i) $(date +%H:%M:%S)" | tee -a "$LOG"
    sleep 30
  done
  return 1
}

for arm in "$@"; do
  retry $arm
done
echo "retry queue done" | tee -a "$LOG"
