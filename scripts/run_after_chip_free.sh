#!/bin/bash
# Wait for a running TPU process to exit, then run the given command with a
# hard wall-clock deadline (epoch seconds) so the chip is guaranteed free
# for the round-end bench. Usage:
#   run_after_chip_free.sh <pid-to-wait-for> <deadline-epoch> <cmd...>
set -u
WAIT_PID=$1; DEADLINE=$2; shift 2
while kill -0 "$WAIT_PID" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[chain] deadline passed while waiting; aborting" >&2
    exit 1
  fi
  sleep 30
done
sleep 20   # let the tunnel drop the old client cleanly
BUDGET=$(( DEADLINE - $(date +%s) ))
if [ "$BUDGET" -lt 300 ]; then
  echo "[chain] <5 min to deadline; not starting" >&2
  exit 1
fi
echo "[chain] chip free; running with ${BUDGET}s budget: $*"
exec timeout "$BUDGET" "$@"
