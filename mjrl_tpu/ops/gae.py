"""Returns and GAE advantages as reverse ``lax.scan``s over the time axis.

Reproduces the reference's advantage math exactly (reference:
mjrl/utils/process_samples.py ``compute_returns`` / ``compute_advantages`` /
``discount_sum``) on fixed-shape, mask-padded batches:

- Returns are pure in-episode Monte-Carlo discounted sums, with NO bootstrap
  on truncation (matching the reference, which fits its baselines against
  un-bootstrapped returns).
- GAE builds the bootstrap value list as ``b1 = append(b, 0 if terminated
  else b[-1])``: a terminated episode bootstraps with 0, a truncated one with
  the value of its own last state. In the fixed-shape form this becomes
  ``v_next[t] = where(done[t], where(terminated[t], 0, v[t]), v[t+1])``.
- ``gae_lambda`` outside ``[0, 1]`` (or ``None``) selects the plain
  ``advantages = returns - V(s)`` estimator, as in the reference.

The scans carry a ``(num_envs,)`` vector so a single time-major scan covers
the whole sharded env axis — no per-env Python loop, no host sync. Episode
boundaries inside a row (auto-reset sampling) are handled by the ``done``
mask resetting the carry.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mjrl_tpu.types import TrajectoryBatch


def discount_sum(x: jax.Array, gamma: float, terminal: float = 0.0) -> jax.Array:
    """``y_t = x_t + gamma * y_{t+1}``, ``y_T = terminal`` (1-D convenience).

    Reference: mjrl/utils/process_samples.py ``discount_sum``.
    """

    def step(carry, xt):
        y = xt + gamma * carry
        return y, y

    _, ys = jax.lax.scan(step, jnp.asarray(terminal, x.dtype), x, reverse=True)
    return ys


def compute_returns(
    rewards: jax.Array,
    done: jax.Array,
    valid: jax.Array,
    gamma: float,
    bootstrap_value: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked in-episode discounted returns over ``(N, T)`` batches.

    The reverse scan resets its carry at episode boundaries (``done``), so a
    row containing several auto-reset episodes yields per-episode returns.

    ``bootstrap_value`` (shape ``(N,)``): value estimate seeding the scan
    carry, used when a row's window cuts an episode mid-flight (auto-reset
    sampling with ``num_steps < horizon``). The reference never faces this
    case — its ``sample_data_batch`` collects whole episodes, so MC returns
    always cover the full episode; fitting a baseline against window-truncated
    returns would bias V(s) low everywhere. Mirrors the ``v_next`` tail
    bootstrap in :func:`compute_gae`: rows whose final step has ``done=True``
    are unaffected (the ``done`` select zeroes the carry), so episode-mode
    semantics are untouched even when a value is passed.
    """
    rewards = rewards * valid.astype(rewards.dtype)
    if bootstrap_value is None:
        carry0 = jnp.zeros(rewards.shape[0], rewards.dtype)
    else:
        carry0 = bootstrap_value.astype(rewards.dtype)

    def step(carry, xs):
        r_t, done_t = xs
        ret = r_t + gamma * jnp.where(done_t, 0.0, carry)
        return ret, ret

    _, rets = jax.lax.scan(
        step,
        carry0,
        (rewards.T, done.T),
        reverse=True,
    )
    return rets.T * valid.astype(rewards.dtype)


def compute_gae(
    rewards: jax.Array,
    values: jax.Array,
    done: jax.Array,
    terminated: jax.Array,
    valid: jax.Array,
    gamma: float,
    gae_lambda: float,
) -> jax.Array:
    """GAE(lambda) over ``(N, T)`` batches with mjrl's bootstrap semantics."""
    dtype = rewards.dtype
    validf = valid.astype(dtype)
    rewards = rewards * validf
    values = values * validf

    # v_next[t]: next-state value used in the TD residual at step t. The
    # final column pads with the row's own last value, NOT zero: a window
    # that cuts an episode mid-flight (auto-reset sampling with
    # num_steps < horizon) is a truncation, and mjrl's truncated paths
    # bootstrap with ``b[-1]`` — the last state's value. Padding with zero
    # would hand every window tail a spuriously huge negative advantage.
    # (In episode mode every live row ends with done=True at t=T-1, so the
    # pad value is overwritten by the `done` select and nothing changes.)
    v_next = jnp.concatenate([values[:, 1:], values[:, -1:]], axis=1)
    v_next = jnp.where(done, jnp.where(terminated, 0.0, values), v_next)
    deltas = (rewards + gamma * v_next - values) * validf

    def step(carry, xs):
        delta_t, done_t = xs
        adv = delta_t + gamma * gae_lambda * jnp.where(done_t, 0.0, carry)
        return adv, adv

    _, advs = jax.lax.scan(
        step,
        jnp.zeros(rewards.shape[0], dtype),
        (deltas.T, done.T),
        reverse=True,
    )
    return advs.T * validf


def masked_mean_std(x: jax.Array, valid: jax.Array, eps: float = 1e-8):
    """Mean/std over valid entries (the reference normalizes over the whole
    concatenated batch, mjrl/utils/process_samples.py)."""
    validf = valid.astype(x.dtype)
    n = jnp.maximum(jnp.sum(validf), 1.0)
    mean = jnp.sum(x * validf) / n
    var = jnp.sum(jnp.square(x - mean) * validf) / n
    return mean, jnp.sqrt(var + eps)


def compute_advantages(
    batch: TrajectoryBatch,
    values: jax.Array,
    gamma: float,
    gae_lambda: Optional[float] = None,
    normalize: bool = False,
    eps: float = 1e-8,
) -> TrajectoryBatch:
    """Fill ``batch.advantages`` (and ``baseline``) like the reference's
    ``compute_advantages(paths, baseline, gamma, gae_lambda, normalize)``.

    ``values`` are the baseline predictions ``V(s_t)`` with shape ``(N, T)``.
    Call :func:`compute_returns` first if ``gae_lambda`` is disabled.
    """
    use_gae = gae_lambda is not None and 0.0 <= float(gae_lambda) <= 1.0
    if use_gae:
        adv = compute_gae(
            batch.rewards,
            values,
            batch.done,
            batch.terminated,
            batch.valid,
            gamma,
            float(gae_lambda),
        )
    else:
        adv = (batch.returns - values) * batch.valid.astype(values.dtype)
    if normalize:
        mean, std = masked_mean_std(adv, batch.valid, eps=0.0)
        adv = (adv - mean) / (std + eps)
        adv = adv * batch.valid.astype(adv.dtype)
    return batch.replace(advantages=adv, baseline=values * batch.valid.astype(values.dtype))
