#!/bin/bash
# Round-2 TPU campaign queue, phase A: newton-contact locomotion + adroit
# hammer/pen experts. Each job goes through the stall-watchdog runner.
set -u
cd "$(dirname "$0")/.."

bash tools/run_job.sh examples/hopper_npg_newton.json runs/hopper_npg_newton
bash tools/run_job.sh examples/walker2d_trpo_newton.json runs/walker2d_trpo_newton
bash tools/run_job.sh examples/adroit_hammer_npg.json runs/adroit_hammer_npg
bash tools/run_job.sh examples/adroit_pen_npg.json runs/adroit_pen_npg
echo "=== queue phase A complete ==="
