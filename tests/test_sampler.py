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


def test_autoreset_carry_persists_across_calls():
    """Persistent carry: the second window continues the same episodes
    (round-1 humanoid failure: always-fresh resets confined training to the
    first num_steps states of every episode)."""
    from mjrl_tpu.samplers.rollout import init_autoreset_carry

    env, pol, params, tf = _setup()  # point_mass never terminates early
    carry = init_autoreset_carry(env, jax.random.PRNGKey(0), 4)
    b1, carry = sample_autoreset(
        env, pol, params, tf, jax.random.PRNGKey(1), 4, num_steps=5,
        episode_horizon=25, carry=carry,
    )
    b2, carry = sample_autoreset(
        env, pol, params, tf, jax.random.PRNGKey(2), 4, num_steps=5,
        episode_horizon=25, carry=carry,
    )
    t1, t2 = np.asarray(b1.time), np.asarray(b2.time)
    assert (t1[:, 0] == 0).all() and (t1[:, -1] == 4).all()
    assert (t2[:, 0] == 5).all() and (t2[:, -1] == 9).all()
    # and the state genuinely carried: window-2 first obs != a fresh reset obs
    assert not np.allclose(np.asarray(b2.observations[:, 0]),
                           np.asarray(b1.observations[:, 0]))


def test_autoreset_carry_respects_horizon_and_done():
    from mjrl_tpu.samplers.rollout import init_autoreset_carry

    env, pol, params, tf = _setup()
    carry = init_autoreset_carry(env, jax.random.PRNGKey(0), 4)
    time = []
    for i in range(7):
        b, carry = sample_autoreset(
            env, pol, params, tf, jax.random.fold_in(jax.random.PRNGKey(1), i),
            4, num_steps=5, episode_horizon=12, carry=carry,
        )
        time.append(np.asarray(b.time))
    time = np.concatenate(time, axis=1)  # (4, 35)
    done_expected = (time == 11)
    assert (time < 12).all()
    # after in-episode time 11 (horizon 12) the row resets to 0
    for i in range(4):
        for t in range(34):
            assert time[i, t + 1] == (0 if done_expected[i, t] else time[i, t] + 1)


def test_agent_jitted_step_threads_sampler_carry():
    """samples-mode jitted_train_step keeps env rows alive across iterations."""
    from mjrl_tpu.algos.base import BatchREINFORCE
    from mjrl_tpu.models.baselines import ZeroBaseline

    env, pol, params, tf = _setup()
    agent = BatchREINFORCE(
        env, pol, ZeroBaseline(env.spec), num_traj=4, num_samples=20,
        sample_mode="samples", horizon=25,
    )
    state = agent.init(jax.random.PRNGKey(0))
    step = agent.jitted_train_step
    state, _ = step(state, jax.random.PRNGKey(1))
    c1 = jax.device_get(agent._sampler_carry)
    assert int(c1[2].min()) == 5  # t_in_ep advanced past window 1
    state, _ = step(state, jax.random.PRNGKey(2))
    c2 = jax.device_get(agent._sampler_carry)
    assert int(c2[2].min()) == 10


def test_episode_scores_accumulate_across_windows():
    """A completed episode's emitted score equals the sum of its rewards even
    when the episode spans several persistent-carry windows."""
    from mjrl_tpu.samplers.rollout import init_autoreset_carry

    env, pol, params, tf = _setup()  # horizon 25, never terminates early
    carry = init_autoreset_carry(env, jax.random.PRNGKey(0), 3)
    rewards, scores, dones = [], [], []
    for i in range(5):  # 5 windows x 10 steps = 50 steps = 2 full episodes
        b, carry = sample_autoreset(
            env, pol, params, tf, jax.random.fold_in(jax.random.PRNGKey(1), i),
            3, num_steps=10, episode_horizon=25, carry=carry,
        )
        rewards.append(np.asarray(b.rewards))
        scores.append(np.asarray(b.env_info["episode_score"]))
        dones.append(np.asarray(b.done))
    rewards = np.concatenate(rewards, axis=1)
    scores = np.concatenate(scores, axis=1)
    dones = np.concatenate(dones, axis=1)
    for i in range(3):
        ends = np.flatnonzero(dones[i])
        np.testing.assert_array_equal(ends, [24, 49])
        np.testing.assert_allclose(
            scores[i, 24], rewards[i, :25].sum(), rtol=1e-5)
        np.testing.assert_allclose(
            scores[i, 49], rewards[i, 25:50].sum(), rtol=1e-5)
        # score emitted ONLY at episode ends
        assert (scores[i, dones[i] == False] == 0).all()  # noqa: E712
