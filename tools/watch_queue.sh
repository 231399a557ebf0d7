#!/bin/bash
# Watchdog around tools/tpu_queue.py: if the queue's log stops growing for
# GRACE seconds (lost chip claim — the process sleeps forever at ~0 CPU),
# kill and relaunch; completed jobs are skipped and partial jobs resume
# from their checkpoints.
# Usage: tools/watch_queue.sh <queue.txt> <logfile>
set -u
QF=$1; LOG=$2
# Phase is tracked EXPLICITLY via a sentinel file (round-4 advisor: the
# previous log-tail pattern matching misclassified any long silent phase
# whose last line wasn't one of four known banners, causing kill loops
# before the first checkpoint). tpu_queue.py writes "compile" on each
# job/%py start; train_agent flips it to "train" after every completed
# iteration. Silence is measured by log growth; which grace applies comes
# from the sentinel:
#   compile -> GRACE       (fresh remote compiles run up to ~1h)
#   train   -> GRACE_TRAIN (steady state prints a table row per iteration,
#                           so 7 silent minutes = stall; a false kill is
#                           cheap — checkpoints exist once any iteration
#                           completed, and the compile cache absorbs the
#                           recompile)
# NOTE an ESTABLISHED relay connection is NOT evidence of liveness under
# AXON_LOOPBACK_RELAY (observed stalled 15+ min with the socket ESTAB).
GRACE=${GRACE:-3600}
GRACE_TRAIN=${GRACE_TRAIN:-420}
cd "$(dirname "$0")/.."
export MJRL_TPU_HEARTBEAT="${MJRL_TPU_HEARTBEAT:-$LOG.phase}"
echo compile > "$MJRL_TPU_HEARTBEAT"
touch "$LOG"
while :; do
  python tools/tpu_queue.py "$QF" >> "$LOG" 2>&1 &
  PID=$!
  stalled=0
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    phase=$(cat "$MJRL_TPU_HEARTBEAT" 2>/dev/null || echo compile)
    case "$phase" in
      train*) grace=$GRACE_TRAIN ;;
      *)      grace=$GRACE ;;
    esac
    if [ "$age" -ge "$grace" ]; then
      echo "[watchdog] $(date -u +%H:%M:%S) queue stalled ${age}s (phase=$phase), restarting" >> "$LOG"
      kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
      wait $PID 2>/dev/null
      stalled=1
      echo compile > "$MJRL_TPU_HEARTBEAT"
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
