#!/bin/bash
# Round-4 on-chip run queue (VERDICT r4 #2/#5/#6): executed sequentially
# after the 21k all-levers cluster run — ONE chip process at a time, host
# kept quiet (see .claude/skills/verify/SKILL.md gotchas).
#
# Usage: bash scripts/r04_run_queue.sh [stage ...]   (default: all stages)
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=runs/r04_queue.log
stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(thicket ablate hybrid)

run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "=== exit $? $(date +%H:%M:%S)" | tee -a "$LOG"
}

for s in "${stages[@]}"; do case "$s" in
  thicket)
    # thin-structure scene with every starvation lever on (r2 bar: >=16)
    run python scripts/quality_bench.py thicket --steps 12000 --tag levers \
        --importance 0.5 --hit-boost 4.0 --split-iter 800 --split-top 768
    ;;
  ablate)
    # per-lever ablation at a short budget (VERDICT r4 #2: each lever
    # alone so the next round knows what worked)
    run python scripts/quality_bench.py cluster --steps 4000 --tag ab_base \
        --test-views 8
    run python scripts/quality_bench.py cluster --steps 4000 --tag ab_imp \
        --test-views 8 --importance 0.5
    run python scripts/quality_bench.py cluster --steps 4000 --tag ab_hit \
        --test-views 8 --hit-boost 4.0
    run python scripts/quality_bench.py cluster --steps 4000 --tag ab_split \
        --test-views 8 --split-iter 600 --split-top 512
    ;;
  hybrid)
    # VERDICT r4 #6: coverage-hole A/B — the init cloud omits two large
    # primitives (bands sphere + purple box); GT still renders them.
    # Points-only cannot recover that geometry; the proposal-NeRF hybrid
    # (+ NeRF-driven point creation) can.
    run python scripts/quality_bench.py cluster --steps 5000 --tag hole_pts \
        --test-views 8 --wh 400 --drop-prims 1,4
    run python scripts/quality_bench.py cluster --steps 5000 --tag hole_nerf \
        --test-views 8 --wh 400 --drop-prims 1,4 \
        --nerf-importance 8 --nerf-create-points
    ;;
esac; done
echo "queue done" | tee -a "$LOG"
