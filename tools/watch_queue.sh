#!/bin/bash
# Watchdog around tools/tpu_queue.py: if the queue's log stops growing for
# GRACE seconds (lost chip claim — the process sleeps forever at ~0 CPU),
# kill and relaunch; completed jobs are skipped and partial jobs resume
# from their checkpoints.
# Usage: tools/watch_queue.sh <queue.txt> <logfile>
set -u
QF=$1; LOG=$2
# 25 min: longer than the longest observed fresh remote compile (~20 min
# for the big adroit programs). A false kill is cheap — the job resumes
# from its checkpoint and the persistent compile cache absorbs the
# recompile — while a missed stall idles the chip indefinitely. NOTE the
# previous heuristic ("an ESTABLISHED relay connection means the far end
# is working") is unusable under AXON_LOOPBACK_RELAY: the loopback
# connection stays ESTABLISHED even when the claim is lost (observed on a
# humanoid run stalled 15+ min at 0% CPU with the socket ESTAB), so age
# is measured purely by log growth.
GRACE=${GRACE:-3600}        # compile phases (fresh program: up to ~1h remote)
GRACE_TRAIN=${GRACE_TRAIN:-420}  # steady-state training prints a table row
                                 # every iteration, so 7 silent minutes = stall
cd "$(dirname "$0")/.."
touch "$LOG"
while :; do
  python tools/tpu_queue.py "$QF" >> "$LOG" 2>&1 &
  PID=$!
  stalled=0
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    # Which grace applies? If the last meaningful log line is a job/py
    # start, a demo/warm-start banner, or a golden-table write, the queue
    # is legitimately silent inside a (possibly very long) compile;
    # anything else means a per-iteration table was printing and silence
    # is a stall.
    last=$(grep -avE "WARNING|experimental|reward functions|^$" "$LOG" | tail -1)
    case "$last" in
      *"[queue]"*|*"wrote "*|*"warm start"*|*"Policy warm"*) grace=$GRACE ;;
      *) grace=$GRACE_TRAIN ;;
    esac
    if [ "$age" -ge "$grace" ]; then
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
