#!/bin/bash
# Round-5 on-chip run queue (VERDICT r4 next-round #2/#3/#7): the quality
# program the round-4 crashes interrupted, run after the INVALID_ARGUMENT
# buffer-pressure fixes. ONE chip process at a time, host kept quiet
# (.claude/skills/verify/SKILL.md gotchas).
#
# Usage: bash scripts/r05_run_queue.sh [stage ...]   (default: all stages)
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=runs/r05_queue.log
stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(cluster_full ablate thicket_levers hole3)

run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "=== exit $? $(date +%H:%M:%S)" | tee -a "$LOG"
}

for s in "${stages[@]}"; do case "$s" in
  cluster_full)
    # VERDICT r4 #3: the 17.65 cluster number of record trained under the
    # max_d truncation — full-budget rerun under correct queries, plateau
    # + wall-clock milestones (curve was fully plateaued by 12k in r2)
    run python scripts/quality_bench.py cluster --steps 10000 --tag full_r5 \
        --test-views 8
    ;;
  ablate)
    # VERDICT r4 #2: per-lever ablation, each lever alone vs base
    run python scripts/quality_bench.py cluster --steps 4000 --tag ab_imp \
        --test-views 8 --importance 0.5
    run python scripts/quality_bench.py cluster --steps 4000 --tag ab_hit \
        --test-views 8 --hit-boost 4.0
    run python scripts/quality_bench.py cluster --steps 4000 --tag ab_split \
        --test-views 8 --split-iter 600 --split-top 512
    run python scripts/quality_bench.py cluster --steps 4000 --tag ab_base \
        --test-views 8
    ;;
  thicket_levers)
    # thin-structure scene, every starvation lever on (the round-4 run died
    # post-split at step 800 — this stage doubles as crash-repro-B
    # validation); base_fixed plateaued at 22.39 @1500, so the bar is:
    # do the levers beat the no-lever curve at matched steps?
    run python scripts/quality_bench.py thicket --steps 8000 --tag levers_r5 \
        --importance 0.5 --hit-boost 4.0 --split-iter 800 --split-top 768
    ;;
  hole3)
    # VERDICT r4 #7: 3-arm coverage-hole A/B WITH probes + creation on —
    # points-only / field-only rendering / field + NeRF-driven creation
    run python scripts/quality_bench.py cluster --steps 5000 --tag hole_pts_r5 \
        --test-views 8 --wh 400 --drop-prims 1,4
    run python scripts/quality_bench.py cluster --steps 5000 --tag hole_nerf_r5 \
        --test-views 8 --wh 400 --drop-prims 1,4 --nerf-importance 8
    run python scripts/quality_bench.py cluster --steps 5000 \
        --tag hole_create_r5 \
        --test-views 8 --wh 400 --drop-prims 1,4 \
        --nerf-importance 8 --nerf-create-points
    ;;
esac; done
echo "queue done" | tee -a "$LOG"
