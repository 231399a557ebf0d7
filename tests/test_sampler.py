"""On-device sampler tests: masking, auto-reset, determinism, stats."""

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.envs import make
from mjrl_tpu.models.gaussian_mlp import GaussianMLP
from mjrl_tpu.samplers.rollout import (
    rollout_statistics,
    sample_autoreset,
    sample_episodes,
)


def _setup(env_id="point_mass", hidden=(8, 8), **env_kwargs):
    env = make(env_id, **env_kwargs)
    pol = GaussianMLP(env.spec, hidden_sizes=hidden)
    params = pol.init(jax.random.PRNGKey(0))
    tf = pol.init_transforms()
    return env, pol, params, tf


def test_episode_shapes():
    env, pol, params, tf = _setup()
    batch = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(1), 4)
    assert batch.observations.shape == (4, 25, 6)
    assert batch.actions.shape == (4, 25, 2)
    assert batch.rewards.shape == (4, 25)
    assert bool(jnp.all(batch.valid))  # point_mass never terminates early
    # truncation at horizon: done at last step only, not terminated
    assert bool(jnp.all(batch.done[:, -1]))
    assert not bool(jnp.any(batch.done[:, :-1]))
    assert not bool(jnp.any(batch.terminated))


def test_episode_termination_masking():
    env, pol, params, tf = _setup("cartpole", hidden=(8,))
    # big init_log_std → wild actions → quick termination
    params["log_std"] = params["log_std"] + 1.0
    batch = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(1), 8)
    done = np.asarray(batch.done)
    valid = np.asarray(batch.valid)
    term = np.asarray(batch.terminated)
    assert term.any(), "expected at least one early termination"
    for i in range(8):
        ends = np.flatnonzero(done[i])
        assert len(ends) == 1  # exactly one episode per row
        L = ends[0] + 1
        assert valid[i, :L].all() and not valid[i, L:].any()
        # rewards zeroed in padding
        assert np.all(np.asarray(batch.rewards)[i, L:] == 0.0)


def test_eval_mode_is_deterministic():
    env, pol, params, tf = _setup()
    b1 = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(1), 4, eval_mode=True)
    b2 = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(1), 4, eval_mode=True)
    np.testing.assert_array_equal(np.asarray(b1.actions), np.asarray(b2.actions))
    np.testing.assert_array_equal(np.asarray(b1.mean), np.asarray(b1.actions))


def test_same_key_same_batch():
    env, pol, params, tf = _setup()
    b1 = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(7), 4)
    b2 = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(7), 4)
    np.testing.assert_array_equal(np.asarray(b1.actions), np.asarray(b2.actions))
    b3 = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(8), 4)
    assert not np.array_equal(np.asarray(b1.actions), np.asarray(b3.actions))


def test_autoreset_all_valid_and_time_resets():
    env, pol, params, tf = _setup("cartpole", hidden=(8,))
    params["log_std"] = params["log_std"] + 1.0
    batch = sample_autoreset(
        env, pol, params, tf, jax.random.PRNGKey(1), 4, num_steps=50, episode_horizon=20
    )
    assert bool(jnp.all(batch.valid))
    time = np.asarray(batch.time)
    done = np.asarray(batch.done)
    for i in range(4):
        for t in range(49):
            if done[i, t]:
                assert time[i, t + 1] == 0  # time resets after done
            else:
                assert time[i, t + 1] == time[i, t] + 1
    assert (time < 20).all()  # horizon enforced


def test_rollout_statistics_episode_mode():
    env, pol, params, tf = _setup()
    batch = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(1), 6)
    stats = rollout_statistics(batch)
    scores = np.asarray(batch.rewards).sum(axis=1)
    np.testing.assert_allclose(float(stats.mean), scores.mean(), rtol=1e-5)
    np.testing.assert_allclose(float(stats.max), scores.max(), rtol=1e-5)
    np.testing.assert_allclose(float(stats.min), scores.min(), rtol=1e-5)
    assert int(stats.num_episodes) == 6


def test_sampler_jits():
    env, pol, params, tf = _setup()
    f = jax.jit(
        lambda p, k: sample_episodes(env, pol, p, tf, k, 4).rewards.sum()
    )
    out = f(params, jax.random.PRNGKey(0))
    assert np.isfinite(float(out))
