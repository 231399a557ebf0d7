#!/bin/bash
# Watchdog around tools/tpu_queue.py: if the queue's log stops growing for
# GRACE seconds (lost chip claim — the process sleeps forever at ~0 CPU),
# kill and relaunch; completed jobs are skipped and partial jobs resume
# from their checkpoints.
# Usage: tools/watch_queue.sh <queue.txt> <logfile>
set -u
QF=$1; LOG=$2
GRACE=${GRACE:-900}
cd "$(dirname "$0")/.."
touch "$LOG"
while :; do
  python tools/tpu_queue.py "$QF" >> "$LOG" 2>&1 &
  PID=$!
  stalled=0
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    # an ESTABLISHED connection to the relay means the far end is working
    # for us (e.g. a long remote compile) — only a silent AND disconnected
    # process is a lost claim
    if ss -tnp 2>/dev/null | grep -q "pid=$PID,"; then
      age=0
    fi
    if [ "$age" -ge "$GRACE" ]; then
      echo "[watchdog] $(date -u +%H:%M:%S) queue stalled ${age}s, restarting" >> "$LOG"
      kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
      wait $PID 2>/dev/null
      stalled=1
      sleep 90
      break
    fi
  done
  if [ "$stalled" = "0" ]; then
    wait $PID; rc=$?
    echo "[watchdog] queue exited rc=$rc" >> "$LOG"
    exit $rc
  fi
done
