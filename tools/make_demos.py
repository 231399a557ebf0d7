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
    p.add_argument(
        "--only-success",
        action="store_true",
        help="keep only episodes the env itself marks successful "
        "(env_info['success'] fired at least once) — the demo-export "
        "route for tasks where a weak policy succeeds occasionally "
        "(relocate: 7%% honest-init success still yields demos)",
    )
    p.add_argument(
        "--max-demos",
        type=int,
        default=None,
        help="cap the output at the N highest-return surviving episodes",
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
    batch = jax.device_get(batch)
    paths = batch_to_paths(batch)
    rets = [float(np.sum(p["rewards"])) for p in paths]
    if args.only_success:
        valid = np.asarray(batch.valid, np.float32)
        ei = batch.env_info
        if "episode_success" in ei:  # auto-reset sampler: emitted at done
            es = np.asarray(ei["episode_success"]) * valid
        elif "success" in ei:  # episodes mode: raw per-step predicate
            es = np.asarray(ei["success"]) * valid
        else:
            raise SystemExit("--only-success: env reports no success info")
        ok = es.max(axis=1) > 0
        n0 = len(paths)
        paths = [p for p, s in zip(paths, ok) if s]
        rets = [r for r, s in zip(rets, ok) if s]
        print(f"success filter: {len(paths)}/{n0} episodes")
    if args.min_return is not None:
        paths = [p for p, r in zip(paths, rets) if r >= args.min_return]
        rets = [r for r in rets if r >= args.min_return]
    if not paths:
        raise SystemExit("no episodes passed the return filter")
    if args.max_demos is not None and len(paths) > args.max_demos:
        order = np.argsort(rets)[::-1][: args.max_demos]
        paths = [paths[i] for i in order]
        rets = [rets[i] for i in order]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(paths, f)
    print(
        f"wrote {len(paths)} demos to {args.out}: return "
        f"mean {np.mean(rets):.1f} min {np.min(rets):.1f} max {np.max(rets):.1f}"
    )


if __name__ == "__main__":
    main()
