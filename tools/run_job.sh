#!/bin/bash
# One TPU training job with a stall watchdog (see run_seeds.sh for the
# failure mode: a chip claim that races the previous release sleeps forever
# at ~0 CPU). Detects "no new log rows within the grace window", kills, and
# relaunches; training resumes from the run's own checkpoints.
# Usage: tools/run_job.sh <config> <outdir> [extra --set overrides...]
set -u
CFG=$1; OUT=$2; shift 2
GRACE=${GRACE:-420}
RETRIES=${RETRIES:-4}

# Skip jobs that already completed (log rows >= configured niter): a queue
# restart must not claim the chip just to discover there is nothing to do.
if [ -f "${OUT}/logs/log.jsonl" ] && [ -f "${OUT}/config.json" ]; then
  if python - "$OUT" <<'PYEOF'
import json, sys
out = sys.argv[1]
niter = json.load(open(f"{out}/config.json")).get("niter", 0)
rows = sum(1 for _ in open(f"{out}/logs/log.jsonl"))
sys.exit(0 if rows >= niter else 1)
PYEOF
  then
    echo "=== ${OUT}: already complete, skipping ==="
    exit 0
  fi
fi

for attempt in $(seq 1 $RETRIES); do
  echo "=== $(date -u +%H:%M:%S) start ${OUT} (attempt ${attempt}) ==="
  if [ $# -gt 0 ]; then
    python -m mjrl_tpu.train --output "$OUT" --config "$CFG" --set "$@" \
      >> "${OUT}.out" 2>&1 &
  else
    python -m mjrl_tpu.train --output "$OUT" --config "$CFG" \
      >> "${OUT}.out" 2>&1 &
  fi
  PID=$!
  waited=0
  rows0=$(wc -l < "${OUT}/logs/log.jsonl" 2>/dev/null || echo 0)
  stalled=0
  while kill -0 $PID 2>/dev/null; do
    sleep 30; waited=$((waited+30))
    rows1=$(wc -l < "${OUT}/logs/log.jsonl" 2>/dev/null || echo 0)
    if [ "$rows1" -gt "$rows0" ]; then
      rows0=$rows1; waited=0
    elif [ "$waited" -ge "$GRACE" ]; then
      echo "=== $(date -u +%H:%M:%S) ${OUT}: stalled ${GRACE}s, kill+retry ==="
      kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
      wait $PID 2>/dev/null
      sleep 90
      stalled=1
      break
    fi
  done
  if [ "$stalled" = "1" ]; then continue; fi
  wait $PID; rc=$?
  echo "=== $(date -u +%H:%M:%S) done ${OUT} rc=${rc} ==="
  sleep 30
  exit $rc
done
echo "=== ${OUT}: gave up after ${RETRIES} attempts ==="
exit 1
