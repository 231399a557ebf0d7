#!/bin/bash
# Multi-seed campaign runner: sequential jobs on the single TPU chip, with a
# stall watchdog. A TPU claim can be lost if it races the previous job's
# release on the tunneled backend (the process then sleeps forever at
# ~0 CPU); we detect "no log rows and no CPU progress within the grace
# window" and relaunch (training resumes from the run's own checkpoints).
# Usage: tools/run_seeds.sh <config> <out_prefix> <niter> <seed...>
set -u
CFG=$1; PREFIX=$2; NITER=$3; shift 3
GRACE=${GRACE:-420}   # seconds to first log row (covers cold compile)
RETRIES=${RETRIES:-3}

run_one() {
  local OUT=$1 SEED=$2 attempt
  for attempt in $(seq 1 $RETRIES); do
    echo "=== $(date -u +%H:%M:%S) start ${OUT} (attempt ${attempt}) ==="
    python -m mjrl_tpu.train --output "$OUT" --config "$CFG" \
      --set seed=$SEED niter=$NITER >> "${OUT}.out" 2>&1 &
    local PID=$!
    # watchdog: wait for the first/next log row
    local waited=0 rows0 rows1
    rows0=$(wc -l < "${OUT}/logs/log.jsonl" 2>/dev/null || echo 0)
    while kill -0 $PID 2>/dev/null; do
      sleep 30; waited=$((waited+30))
      rows1=$(wc -l < "${OUT}/logs/log.jsonl" 2>/dev/null || echo 0)
      if [ "$rows1" -gt "$rows0" ]; then
        rows0=$rows1; waited=0   # making progress; reset the clock
      elif [ "$waited" -ge "$GRACE" ]; then
        echo "=== $(date -u +%H:%M:%S) ${OUT}: stalled ${GRACE}s, kill+retry ==="
        kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
        wait $PID 2>/dev/null
        sleep 90   # let the far-end session/grant expire
        continue 2
      fi
    done
    wait $PID; local rc=$?
    echo "=== $(date -u +%H:%M:%S) done ${OUT} rc=${rc} ==="
    # give the chip release time to land before the next claim
    sleep 30
    return $rc
  done
  echo "=== ${OUT}: gave up after ${RETRIES} attempts ==="
  return 1
}

for SEED in "$@"; do
  run_one "runs/${PREFIX}_s${SEED}" "$SEED"
done
