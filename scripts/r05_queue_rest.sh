#!/bin/bash
# Remainder of the round-5 queue after the 10:22 tunnel stall ate ~70 min
# (see PERF.md round-5 notes): ab_base is DROPPED — the no-lever
# cluster_full_r5 curve at matched steps is the base control (identical
# config, levers off) — and thicket/hole budgets are trimmed to fit the
# round. Run after the orphaned ab_imp arm finishes.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=runs/r05_queue.log

run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== exit $? $(date +%H:%M:%S)" | tee -a "$LOG"
}

run python scripts/quality_bench.py cluster --steps 4000 --tag ab_hit \
    --test-views 8 --hit-boost 4.0
run python scripts/quality_bench.py cluster --steps 4000 --tag ab_split \
    --test-views 8 --split-iter 600 --split-top 512
run python scripts/quality_bench.py thicket --steps 6000 --tag levers_r5 \
    --importance 0.5 --hit-boost 4.0 --split-iter 800 --split-top 768
run python scripts/quality_bench.py cluster --steps 4000 --tag hole_pts_r5 \
    --test-views 8 --wh 400 --drop-prims 1,4
run python scripts/quality_bench.py cluster --steps 4000 --tag hole_nerf_r5 \
    --test-views 8 --wh 400 --drop-prims 1,4 --nerf-importance 8
run python scripts/quality_bench.py cluster --steps 4000 --tag hole_create_r5 \
    --test-views 8 --wh 400 --drop-prims 1,4 \
    --nerf-importance 8 --nerf-create-points
echo "rest done" | tee -a "$LOG"
