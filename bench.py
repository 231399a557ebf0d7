"""Benchmark: fused NPG iteration throughput on the local accelerator.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Metric: aggregate env-steps/s of the full fused training iteration
(on-device rollout + GAE + CG natural-gradient update + quadratic-baseline
fit) on the point-mass env — config #1 of BASELINE.json's ladder (the Ant
NPG metric of record lands when the rigid-body physics engine does).
``vs_baseline`` is measured against the north-star target of 1,000,000
aggregate env-steps/s (BASELINE.md; the reference publishes no numbers —
its architectural estimate is O(10^2-10^3) steps/s per CPU worker).
"""

from __future__ import annotations

import json
import time

import jax


def main() -> None:
    from mjrl_tpu import envs
    from mjrl_tpu.algos import NPG
    from mjrl_tpu.models import GaussianMLP, QuadraticBaseline

    num_envs = 4096
    horizon = 25
    env = envs.make("point_mass", horizon=horizon)
    policy = GaussianMLP(env.spec, hidden_sizes=(64, 64))
    baseline = QuadraticBaseline(env.spec)
    agent = NPG(env, policy, baseline, num_traj=num_envs, horizon=horizon)

    state = agent.init(jax.random.PRNGKey(0))
    step = agent.jitted_train_step

    # Warmup: compile + 2 steady-state iterations.
    for i in range(3):
        state, metrics = step(state, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    steps_per_sec = num_envs * horizon * iters / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_pointmass_npg_fused_iter",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / 1_000_000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
