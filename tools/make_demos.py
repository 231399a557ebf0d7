"""Export expert demonstrations from a trained job directory.

Rolls N deterministic (mean-action) episodes of the job's best checkpointed
policy and writes them as an mjrl-format demo pickle — a list of path dicts
``{observations, actions, rewards, terminated}`` (reference: the hand_dapg
demo pickles consumed by mjrl/algos/dapg.py and behavior_cloning.py). The
output feeds ``RunConfig.demo_file`` for BC / DAPG jobs.

Usage:
    python tools/make_demos.py --job runs/my_expert --out demos/my_task.pickle \
        [--episodes 25] [--stochastic] [--min-return R]
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description="export demos from a trained job")
    p.add_argument("--job", required=True, help="job directory (has config.json)")
    p.add_argument("--out", required=True, help="output demo pickle path")
    p.add_argument("--episodes", type=int, default=25)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument(
        "--stochastic", action="store_true", help="sample actions instead of mean"
    )
    p.add_argument(
        "--min-return",
        type=float,
        default=None,
        help="keep only episodes with undiscounted return >= this",
    )
    args = p.parse_args()

    from mjrl_tpu.samplers.rollout import sample_episodes
    from mjrl_tpu.utils.checkpoint import CheckpointManager
    from mjrl_tpu.utils.configs import RunConfig, build
    from mjrl_tpu.utils.demos import batch_to_paths

    cfg = RunConfig.from_json(os.path.join(args.job, "config.json"))
    env, policy, _, agent = build(cfg)
    state = agent.init(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(args.job)
    state = ckpt.restore_best(jax.device_get(state))

    batch = sample_episodes(
        env,
        policy,
        state.params,
        state.transforms,
        jax.random.PRNGKey(args.seed),
        args.episodes,
        cfg.horizon,
        eval_mode=not args.stochastic,
    )
    paths = batch_to_paths(jax.device_get(batch))
    rets = [float(np.sum(p["rewards"])) for p in paths]
    if args.min_return is not None:
        paths = [p for p, r in zip(paths, rets) if r >= args.min_return]
        rets = [r for r in rets if r >= args.min_return]
    if not paths:
        raise SystemExit("no episodes passed the return filter")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(paths, f)
    print(
        f"wrote {len(paths)} demos to {args.out}: return "
        f"mean {np.mean(rets):.1f} min {np.min(rets):.1f} max {np.max(rets):.1f}"
    )


if __name__ == "__main__":
    main()
