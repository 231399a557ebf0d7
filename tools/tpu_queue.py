#!/usr/bin/env python
"""Run a sequence of training jobs in ONE python process.

The tunneled single-chip backend loses chip claims when processes churn
(every new python process re-claims; a claim racing the previous release
sleeps forever — see tools/run_job.sh). Running the whole campaign inside
one process claims the chip exactly once and eliminates the race class.

Queue file: one job per line, ``<config.json> <output_dir> [key=value ...]``,
``#`` comments allowed. Jobs whose log already has >= niter rows are
skipped, so a killed queue can simply be relaunched. A line starting with
``!`` runs as a shell command instead (e.g. exporting demos between an
expert job and the DAPG job that consumes them — run such steps on CPU so
they don't fight this process's chip claim); a failing shell step aborts
the remaining queue since later jobs likely depend on it.

    python tools/tpu_queue.py queue.txt
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def job_complete(output: str, overrides=()) -> bool:
    cfg_path = os.path.join(output, "config.json")
    log_path = os.path.join(output, "logs", "log.csv")
    if not (os.path.exists(cfg_path) and os.path.exists(log_path)):
        return False
    try:
        niter = json.load(open(cfg_path)).get("niter", 0)
        # an explicit niter override on the queue line wins over the stale
        # config.json (the continuation-run case: "resume s0 to 1200 iters")
        for kv in overrides:
            k, _, v = kv.partition("=")
            if k == "niter":
                niter = int(float(v))
        with open(log_path) as f:
            rows = sum(1 for _ in f) - 1
        return rows >= niter
    except Exception:
        return False


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    lines = []
    with open(sys.argv[1]) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                lines.append(line)

    # Persistent compilation cache: multi-seed campaigns re-trace the SAME
    # program per seed (fresh agent objects), so keying on HLO lets seeds
    # 2..N skip the multi-minute TPU compile. Harmless if the backend
    # doesn't support it.
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "runs", ".jax_cache"),
    )

    from mjrl_tpu.train import load_config, run_job

    def mark_phase(phase: str) -> None:
        # Phase sentinel for tools/watch_queue.sh: "compile" on job/step
        # start (long watchdog grace — fresh remote compiles run up to
        # ~1h), flipped to "train" by train_agent after each completed
        # iteration (short grace). Replaces the log-tail pattern matching
        # the round-4 advisor flagged as misclassification-prone.
        hb = os.environ.get("MJRL_TPU_HEARTBEAT")
        if hb:
            try:
                with open(hb, "w") as f:
                    f.write(phase + "\n")
            except OSError:
                pass

    failures = 0
    for line in lines:
        if line.startswith("!"):
            import subprocess

            cmd = line[1:].strip()
            print(f"[queue] shell: {cmd}", flush=True)
            rc = subprocess.call(cmd, shell=True)
            if rc != 0:
                print(f"[queue] shell step rc={rc}; aborting queue", flush=True)
                sys.exit(1)
            continue
        if line.startswith("%"):
            # In-process python step: `%<script.py> [argv...]` runs inside
            # THIS process, sharing its chip claim — the only way a queue
            # can interleave device-touching tools (probes, golden-table
            # generation) between training jobs on the single-claim
            # tunneled backend (a subprocess would deadlock on the claim).
            # Failures are logged but NON-fatal: probes must not cancel the
            # training tail behind them. Scripts run via runpy share this
            # process's globals — they must NOT mutate process-global
            # config (jax config flags, sys.path, module caches) or the
            # leakage hits every job queued after them.
            import runpy
            import shlex

            argv = shlex.split(line[1:].strip())
            print(f"[queue] py: {' '.join(argv)}", flush=True)
            mark_phase("compile")
            saved = sys.argv
            try:
                sys.argv = argv
                runpy.run_path(argv[0], run_name="__main__")
                print(f"[queue] py done {argv[0]}", flush=True)
            except SystemExit as e:
                code = e.code if isinstance(e.code, int) else 0
                print(f"[queue] py {argv[0]} exit={code}", flush=True)
            except Exception:
                print(
                    f"[queue] py FAILED {argv[0]} (non-fatal):\n"
                    f"{traceback.format_exc()}",
                    flush=True,
                )
            finally:
                sys.argv = saved
            continue
        parts = line.split()
        cfg_path, output, overrides = parts[0], parts[1], parts[2:]
        if job_complete(output, overrides):
            print(f"[queue] {output}: already complete, skipping", flush=True)
            continue
        print(f"[queue] start {output} ({cfg_path})", flush=True)
        mark_phase("compile")
        try:
            run_job(load_config(cfg_path, overrides), output)
            print(f"[queue] done {output}", flush=True)
        except Exception:
            failures += 1
            print(f"[queue] FAILED {output}:\n{traceback.format_exc()}",
                  flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
