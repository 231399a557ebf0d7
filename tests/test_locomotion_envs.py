"""Locomotion env tests: gym-v4 convention parity + stability.

Convention checks (obs layout, reward decomposition, termination) run
against hand-computed expectations; numerical dynamics parity with MuJoCo is
covered separately in test_physics_mujoco.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjrl_tpu import envs

CASES = [
    ("hopper", 11, 3),
    ("walker2d", 17, 6),
    ("half_cheetah", 17, 6),
    ("swimmer", 8, 2),
    ("ant", 27, 8),
]


@pytest.mark.parametrize("name,obs_dim,act_dim", CASES)
def test_spec_dims(name, obs_dim, act_dim):
    env = envs.make(name, horizon=100)
    assert env.spec.observation_dim == obs_dim
    assert env.spec.action_dim == act_dim
    ps, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (obs_dim,)


@pytest.mark.parametrize("name", ["hopper", "ant"])
def test_zero_action_stays_finite_and_healthy_initially(name):
    env = envs.make(name, horizon=100)
    ps, obs = env.reset(jax.random.PRNGKey(0))
    stepf = jax.jit(env.step)
    for _ in range(50):
        ps, obs, r, term, info = stepf(ps, jnp.zeros(env.spec.action_dim))
        assert bool(jnp.all(jnp.isfinite(ps.q)))
        assert bool(jnp.all(jnp.isfinite(obs)))


def test_hopper_reward_decomposition():
    env = envs.make("hopper", horizon=100)
    ps, obs = env.reset(jax.random.PRNGKey(0))
    a = jnp.array([0.5, -0.25, 0.1])
    x_before = float(ps.q[0])
    ps2, obs2, r, term, info = jax.jit(env.step)(ps, a)
    x_vel = (float(ps2.q[0]) - x_before) / (env.model.dt * env.frame_skip)
    np.testing.assert_allclose(float(info["x_velocity"]), x_vel, rtol=1e-4)
    ctrl_cost = 1e-3 * float(jnp.sum(a**2))
    # healthy at start -> healthy_reward 1.0
    np.testing.assert_allclose(float(r), 1.0 + x_vel - ctrl_cost, rtol=1e-4)


def test_hopper_termination_on_fall():
    env = envs.make("hopper", horizon=500)
    ps, _ = env.reset(jax.random.PRNGKey(0))
    stepf = jax.jit(env.step)
    terminated = False
    for i in range(400):
        ps, obs, r, term, info = stepf(ps, jnp.zeros(3))
        if bool(term):
            terminated = True
            break
    assert terminated, "hopper with zero action should fall over"
    # unhealthy: one of the v4 conditions violated
    z, angle = float(ps.q[1]), float(ps.q[2])
    assert z < 0.7 or abs(angle) > 0.2


def test_cheetah_never_terminates():
    env = envs.make("half_cheetah", horizon=100)
    ps, _ = env.reset(jax.random.PRNGKey(1))
    stepf = jax.jit(env.step)
    key = jax.random.PRNGKey(2)
    for _ in range(60):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (6,), minval=-1, maxval=1)
        ps, obs, r, term, info = stepf(ps, a)
        assert not bool(term)


def test_ant_healthy_range():
    env = envs.make("ant", horizon=100)
    ps, _ = env.reset(jax.random.PRNGKey(0))
    assert bool(env._healthy(ps))
    low = type(ps)(q=ps.q.at[2].set(0.15), qd=ps.qd)
    assert not bool(env._healthy(low))
    high = type(ps)(q=ps.q.at[2].set(1.2), qd=ps.qd)
    assert not bool(env._healthy(high))
    nan = type(ps)(q=ps.q.at[3].set(jnp.nan), qd=ps.qd)
    assert not bool(env._healthy(nan))


def test_obs_layout_matches_state():
    """obs = [qpos[k:], qvel] with the env's clipping conventions."""
    env = envs.make("hopper", horizon=10)
    ps, obs = env.reset(jax.random.PRNGKey(0))
    want = np.concatenate(
        [np.asarray(ps.q)[1:], np.clip(np.asarray(ps.qd), -10, 10)]
    )
    np.testing.assert_allclose(np.asarray(obs), want, rtol=1e-6)

    env = envs.make("ant", horizon=10)
    ps, obs = env.reset(jax.random.PRNGKey(0))
    want = np.concatenate([np.asarray(ps.q)[2:], np.asarray(ps.qd)])
    np.testing.assert_allclose(np.asarray(obs), want, rtol=1e-6)


def test_reset_noise_bounds():
    env = envs.make("hopper", horizon=10)
    q0 = np.asarray(env.model.default_qpos)
    for seed in range(5):
        ps, _ = env.reset(jax.random.PRNGKey(seed))
        assert np.abs(np.asarray(ps.q) - q0).max() <= 5e-3 + 1e-7
        assert np.abs(np.asarray(ps.qd)).max() <= 5e-3 + 1e-7


def test_swimmer_fluid_produces_thrust():
    """Undulating the swimmer's joints must generate forward motion —
    this only works if the fluid model is active."""
    env = envs.make("swimmer", horizon=200)
    ps, _ = env.reset(jax.random.PRNGKey(0))
    x0 = float(ps.q[0])
    stepf = jax.jit(env.step)
    for i in range(200):
        t = i * env.model.dt * env.frame_skip
        a = jnp.array([jnp.sin(6.0 * t), jnp.cos(6.0 * t)])
        ps, obs, r, term, info = stepf(ps, a)
    assert abs(float(ps.q[0]) - x0) > 0.05, "swimmer should move through fluid"
