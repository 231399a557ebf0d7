"""On-device trajectory sampling: ``vmap`` over envs, ``lax.scan`` over time.

This replaces the reference's entire sampling subsystem (reference:
mjrl/samplers/core.py ``do_rollout`` / ``sample_paths`` /
``sample_data_batch`` / ``_try_multiprocess``): where mjrl forks a
``multiprocessing.Pool`` of CPU workers each stepping one mujoco_py instance
and pickling path dicts back, here thousands of pure-function env instances
advance in lockstep inside a single jitted program. There is no process
boundary, no pickling, no timeout watchdog — the failure-recovery story moves
to checkpoint/restore (see utils/checkpoint.py).

Two modes, mirroring the reference's two entry points:

- :func:`sample_episodes` == ``sample_paths`` (mode="trajectories"): every row
  is one episode started fresh; early-terminated rows are padded (``valid``
  mask) and their env state frozen so unstable dynamics can't NaN after death.
- :func:`sample_autoreset` == ``sample_data_batch`` (mode="samples"): rows run
  continuously with in-scan resets at termination/horizon, so every step is
  valid — the high-throughput mode for PPO-scale batches.

Determinism: per-env PRNG keys are derived by ``jax.random.split`` from one
base key (the reference derives worker seeds as ``base_seed + i *
paths_per_cpu``); the same key always reproduces the same batch on any mesh
layout because each env folds only its own key.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.base import Env
from mjrl_tpu.models.gaussian_mlp import GaussianMLP
from mjrl_tpu.ops.distributions import DiagGaussian
from mjrl_tpu.types import TrajectoryBatch


def _select_tree(pred: jax.Array, on_true: Any, on_false: Any) -> Any:
    """Elementwise tree select with a (N,)-shaped predicate broadcast to leaves."""

    def sel(a, b):
        p = pred.reshape(pred.shape + (1,) * (a.ndim - pred.ndim))
        return jnp.where(p, a, b)

    return jax.tree.map(sel, on_true, on_false)


def sample_episodes(
    env: Env,
    policy: GaussianMLP,
    params: Any,
    transforms: Any,
    key: jax.Array,
    num_envs: int,
    horizon: Optional[int] = None,
    eval_mode: bool = False,
) -> TrajectoryBatch:
    """One fresh episode per row; fixed horizon with validity masking.

    ``eval_mode=True`` uses the deterministic mean action (the reference's
    evaluation rollouts, mjrl/samplers/core.py ``do_rollout(eval_mode=...)``).
    """
    T = horizon or env.spec.horizon
    key_reset, key_scan = jax.random.split(key)
    reset_keys = jax.random.split(key_reset, num_envs)
    env_states, obs = jax.vmap(env.reset)(reset_keys)

    def step_fn(carry, t):
        env_states, obs, finished, key = carry
        key, k_act = jax.random.split(key)
        mean, log_std = policy.apply(params, transforms, obs)
        if eval_mode:
            action = mean
        else:
            action = DiagGaussian.sample(k_act, mean, log_std)
        log_prob = DiagGaussian.log_prob(action, mean, log_std)
        new_states, new_obs, reward, term, info = jax.vmap(env.step)(
            env_states, action
        )
        valid_t = jnp.logical_not(finished)
        is_last = jnp.logical_or(term, t == T - 1)
        done_t = jnp.logical_and(valid_t, is_last)
        terminated_t = jnp.logical_and(valid_t, term)
        new_finished = jnp.logical_or(finished, term)
        # Freeze finished envs so post-termination dynamics can't blow up.
        env_states = _select_tree(finished, env_states, new_states)
        next_obs = jnp.where(finished[:, None], obs, new_obs)
        out = dict(
            obs=obs,
            action=action,
            reward=reward * valid_t.astype(reward.dtype),
            done=done_t,
            terminated=terminated_t,
            valid=valid_t,
            mean=mean,
            log_std=log_std,
            log_prob=log_prob,
            time=jnp.full((num_envs,), t, jnp.int32),
            info=info,
        )
        return (env_states, next_obs, new_finished, key), out

    finished0 = jnp.zeros((num_envs,), dtype=bool)
    _, traj = jax.lax.scan(
        step_fn,
        (env_states, obs, finished0, key_scan),
        jnp.arange(T),
    )
    return _to_batch(traj)


def init_autoreset_carry(env: Env, key: jax.Array, num_envs: int):
    """Fresh sampler carry for :func:`sample_autoreset`'s persistent mode.

    ``(env_states, obs, t_in_ep, ep_return, ep_success)`` — the last two are
    running per-episode accumulators so episode scores stay correct when an
    episode spans several sampling windows.
    """
    reset_keys = jax.random.split(key, num_envs)
    env_states, obs = jax.vmap(env.reset)(reset_keys)
    zeros = jnp.zeros((num_envs,))
    return (env_states, obs, jnp.zeros((num_envs,), jnp.int32), zeros, zeros)


def sample_autoreset(
    env: Env,
    policy: GaussianMLP,
    params: Any,
    transforms: Any,
    key: jax.Array,
    num_envs: int,
    num_steps: int,
    episode_horizon: Optional[int] = None,
    eval_mode: bool = False,
    carry: Optional[
        Tuple[Any, jax.Array, jax.Array, jax.Array, jax.Array]
    ] = None,
) -> Any:
    """Continuous rows with in-scan auto-reset — every transition is valid.

    With ``carry=None`` every call starts all envs from reset and returns just
    the batch (the stateless form). Passing a carry (from
    :func:`init_autoreset_carry` or a previous call) makes the rows PERSIST
    across calls — essential when ``num_steps`` is much smaller than the
    episode horizon, otherwise training only ever visits the first
    ``num_steps`` states of any episode (the round-1 humanoid-PPO failure
    mode). This matches the reference's ``sample_data_batch``, whose paths
    cover the full episode distribution. Returns ``(batch, new_carry)``.
    """
    H = episode_horizon or env.spec.horizon
    key_reset, key_scan = jax.random.split(key)
    if carry is None:
        carry_in = init_autoreset_carry(env, key_reset, num_envs)
    else:
        carry_in = carry

    def step_fn(scan_carry, _):
        env_states, obs, t_in_ep, ep_ret, ep_suc, key = scan_carry
        key, k_act, k_reset = jax.random.split(key, 3)
        mean, log_std = policy.apply(params, transforms, obs)
        if eval_mode:
            action = mean
        else:
            action = DiagGaussian.sample(k_act, mean, log_std)
        log_prob = DiagGaussian.log_prob(action, mean, log_std)
        new_states, new_obs, reward, term, info = jax.vmap(env.step)(
            env_states, action
        )
        truncated = (t_in_ep + 1) >= H
        done_t = jnp.logical_or(term, truncated)
        reset_states, reset_obs = jax.vmap(env.reset)(
            jax.random.split(k_reset, num_envs)
        )
        next_states = _select_tree(done_t, reset_states, new_states)
        next_obs = jnp.where(done_t[:, None], reset_obs, new_obs)
        next_t = jnp.where(done_t, 0, t_in_ep + 1)
        # Whole-episode score/success accumulators: emitted at done so
        # statistics stay correct when an episode spans several windows.
        ret_acc = ep_ret + reward
        if "success" in info:
            suc_acc = jnp.maximum(ep_suc, info["success"].astype(ep_suc.dtype))
            info = {**info, "episode_success": jnp.where(done_t, suc_acc, 0.0)}
        else:
            suc_acc = ep_suc
        info = {**info, "episode_score": jnp.where(done_t, ret_acc, 0.0)}
        next_ret = jnp.where(done_t, 0.0, ret_acc)
        next_suc = jnp.where(done_t, 0.0, suc_acc)
        out = dict(
            obs=obs,
            action=action,
            reward=reward,
            done=done_t,
            terminated=term,
            valid=jnp.ones((num_envs,), dtype=bool),
            mean=mean,
            log_std=log_std,
            log_prob=log_prob,
            time=t_in_ep,
            info=info,
        )
        return (next_states, next_obs, next_t, next_ret, next_suc, key), out

    (env_states, obs, t_in_ep, ep_ret, ep_suc, _), traj = jax.lax.scan(
        step_fn, carry_in + (key_scan,), None, length=num_steps
    )
    batch = _to_batch(traj)
    if carry is None:
        return batch
    return batch, (env_states, obs, t_in_ep, ep_ret, ep_suc)


def _to_batch(traj: Dict[str, Any]) -> TrajectoryBatch:
    """Time-major scan outputs ``(T, N, ...)`` -> env-major batch ``(N, T, ...)``."""

    def tn(x):
        return jnp.swapaxes(x, 0, 1)

    return TrajectoryBatch(
        observations=tn(traj["obs"]),
        actions=tn(traj["action"]),
        rewards=tn(traj["reward"]),
        valid=tn(traj["valid"]),
        done=tn(traj["done"]),
        terminated=tn(traj["terminated"]),
        mean=tn(traj["mean"]),
        log_std=tn(traj["log_std"]),
        log_prob=tn(traj["log_prob"]),
        time=tn(traj["time"]),
        returns=jnp.zeros_like(tn(traj["reward"])),
        baseline=jnp.zeros_like(tn(traj["reward"])),
        advantages=jnp.zeros_like(tn(traj["reward"])),
        env_info=jax.tree.map(tn, traj["info"]),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RolloutStats:
    """Per-batch episode-score statistics (the reference's
    ``log_rollout_statistics``: stoc_pol_mean/std/max/min, success_rate)."""

    mean: jax.Array
    std: jax.Array
    max: jax.Array
    min: jax.Array
    success_rate: jax.Array
    num_episodes: jax.Array


def rollout_statistics(batch: TrajectoryBatch) -> RolloutStats:
    """Undiscounted per-episode scores. In episode mode each row is one
    episode; in auto-reset mode scores are summed per completed episode
    segment via the done mask (incomplete tail segments are ignored in the
    mean/std by weighting)."""
    validf = batch.valid.astype(batch.rewards.dtype)
    rewards = batch.rewards * validf

    if "episode_score" in batch.env_info:
        # Persistent auto-reset sampling emits the WHOLE episode's return at
        # each done (accumulated across windows in the sampler carry) — the
        # in-window scan below would under-count episodes spanning windows.
        scores = batch.env_info["episode_score"] * validf
    else:
        # Per-episode accumulation: forward scan summing rewards, emitting
        # at done.
        def step(carry, xs):
            r_t, done_t = xs
            acc = carry + r_t
            out = jnp.where(done_t, acc, 0.0)
            carry = jnp.where(done_t, 0.0, acc)
            return carry, (out, done_t)

        _, (scores, _) = jax.lax.scan(
            step,
            jnp.zeros(rewards.shape[0], rewards.dtype),
            (rewards.T, batch.done.T),
        )
        scores = scores.T  # (N, T), nonzero only at episode ends
    done = batch.done
    raw_ep = jnp.sum(done.astype(rewards.dtype))
    n_ep = jnp.maximum(raw_ep, 1.0)
    has_ep = raw_ep > 0
    mean = jnp.sum(scores) / n_ep
    var = jnp.sum(jnp.where(done, jnp.square(scores - mean), 0.0)) / n_ep
    big = jnp.asarray(jnp.finfo(rewards.dtype).max, rewards.dtype)
    # a short auto-reset window may complete no episode at all; report 0
    # rather than +/-float-max sentinels
    mx = jnp.where(has_ep, jnp.max(jnp.where(done, scores, -big)), 0.0)
    mn = jnp.where(has_ep, jnp.min(jnp.where(done, scores, big)), 0.0)

    if "episode_success" in batch.env_info:
        success_rate = (
            100.0 * jnp.sum(batch.env_info["episode_success"] * validf) / n_ep
        )
    elif "success" in batch.env_info:
        succ = batch.env_info["success"] * validf

        def sstep(carry, xs):
            s_t, done_t = xs
            acc = jnp.maximum(carry, s_t)
            out = jnp.where(done_t, acc, 0.0)
            carry = jnp.where(done_t, 0.0, acc)
            return carry, out

        _, ep_succ = jax.lax.scan(
            sstep, jnp.zeros(succ.shape[0], succ.dtype), (succ.T, done.T)
        )
        success_rate = 100.0 * jnp.sum(ep_succ) / n_ep
    else:
        success_rate = jnp.asarray(0.0, rewards.dtype)

    return RolloutStats(
        mean=mean,
        std=jnp.sqrt(var),
        max=mx,
        min=mn,
        success_rate=success_rate,
        num_episodes=raw_ep,
    )
