#!/bin/bash
# Round-5 retry queue for the arms killed by the 12:28-12:53 tunnel-flake
# cluster (every death was a probe firing 1-2 steps after an eval; see
# PERF.md round-5 incident log). Mitigation: probes stay ON but at a
# prime cadence (997) that never lands adjacent to the 500-step evals.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=runs/r05_queue.log

run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "=== exit $? $(date +%H:%M:%S)" | tee -a "$LOG"
}

run python scripts/quality_bench.py cluster --steps 4000 --tag hole_pts_r5 \
    --test-views 8 --wh 400 --drop-prims 1,4 --prob-freq 997
run python scripts/quality_bench.py cluster --steps 4000 --tag hole_nerf_r5 \
    --test-views 8 --wh 400 --drop-prims 1,4 --nerf-importance 8 \
    --prob-freq 997
run python scripts/quality_bench.py cluster --steps 4000 --tag hole_create_r5 \
    --test-views 8 --wh 400 --drop-prims 1,4 --nerf-importance 8 \
    --nerf-create-points --prob-freq 997
run python scripts/quality_bench.py thicket --steps 6000 --tag levers_r5 \
    --importance 0.5 --hit-boost 4.0 --split-iter 800 --split-top 768 \
    --prob-freq 997
run python scripts/quality_bench.py cluster --steps 4000 --tag ab_split \
    --test-views 8 --split-iter 600 --split-top 512 --prob-freq 997 --resume
echo "retry2 done" | tee -a "$LOG"
