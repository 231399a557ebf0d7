"""CLI: ``python -m mjrl_tpu.train --output <dir> --config <cfg.json>``.

Capability twin of the reference's job script (reference:
examples/policy_opt_job_script.py): build env/policy/baseline/agent from a
JSON config, run ``train_agent``. Inline overrides: ``--set key=value``.
"""

from __future__ import annotations

import argparse
import json
import os

from mjrl_tpu.utils.configs import RunConfig, build, obs_norm_init, warm_start
from mjrl_tpu.utils.train_agent import train_agent


def main() -> None:
    p = argparse.ArgumentParser(description="mjrl_tpu policy optimization job")
    p.add_argument("--output", required=True, help="job directory")
    p.add_argument("--config", default=None, help="JSON config path")
    p.add_argument(
        "--set",
        nargs="*",
        default=[],
        metavar="KEY=VALUE",
        help="config overrides, JSON-parsed values (e.g. niter=50)",
    )
    args = p.parse_args()

    raw = {}
    if args.config:
        with open(args.config) as f:
            raw = json.load(f)
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            raw[k] = json.loads(v)
        except json.JSONDecodeError:
            raw[k] = v
    cfg = RunConfig.from_dict(raw)
    cfg.to_json(os.path.join(args.output, "config.json"))
    _, policy, _, agent = build(cfg)
    init_state = None
    if cfg.bc_init:
        init_state = warm_start(cfg, agent, policy, seed=cfg.seed)
    if cfg.obs_norm:
        import jax

        init_state = obs_norm_init(
            agent,
            init_state if init_state is not None else agent.init(
                jax.random.PRNGKey(cfg.seed)
            ),
            jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 2),
        )
    train_agent(
        args.output,
        agent,
        seed=cfg.seed,
        niter=cfg.niter,
        save_freq=cfg.save_freq,
        evaluation_rollouts=cfg.evaluation_rollouts,
        plot_keys=cfg.plot_keys,
        init_state=init_state,
    )


if __name__ == "__main__":
    main()
