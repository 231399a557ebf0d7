"""Benchmark: fused NPG iteration throughput on the local accelerator.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Metric of record (BASELINE.json): env-steps/s/chip on Ant NPG — the full
fused training iteration (on-device physics rollout of 1024 ants x 100
control steps = 2M rigid-body substeps, GAE, CG natural-gradient update,
MLP-baseline fit) on the first-party engine. ``vs_baseline`` compares
against the per-chip share of the 1M aggregate env-steps/s north-star on a
v5e-16 (1e6 / 16 = 62,500); the reference publishes no numbers (its
architectural estimate is O(10^2-10^3) steps/s per CPU worker).

NOTE: on the tunneled axon TPU backend ``jax.block_until_ready`` is a
no-op; timing uses scalar-readback fences (reads a metric to host, which
waits for the chained computation).
"""

from __future__ import annotations

import json
import time

import jax


def main() -> None:
    from mjrl_tpu import envs
    from mjrl_tpu.algos import NPG
    from mjrl_tpu.models import GaussianMLP, MLPBaseline

    num_envs = 1024
    horizon = 100
    env = envs.make("ant", horizon=horizon)
    policy = GaussianMLP(env.spec, hidden_sizes=(64, 64))
    baseline = MLPBaseline(env.spec, epochs=2, batch_size=1024)
    agent = NPG(
        env,
        policy,
        baseline,
        normalized_step_size=0.05,
        num_traj=num_envs,
        horizon=horizon,
    )

    state = agent.init(jax.random.PRNGKey(0))
    step = agent.jitted_train_step

    # Warmup: compile + 2 steady-state iterations (fenced by readback).
    for i in range(3):
        state, metrics = step(state, jax.random.PRNGKey(i))
    float(metrics["stoc_pol_mean"])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, jax.random.PRNGKey(100 + i))
    float(metrics["stoc_pol_mean"])  # fences the whole chain
    dt = time.perf_counter() - t0

    steps_per_sec = num_envs * horizon * iters / dt
    per_chip_target = 1_000_000.0 / 16.0
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_ant_npg_fused_iter",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_sec / per_chip_target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
