"""evaluate_policy / export_rollout (reference: GymEnv.evaluate_policy)."""

import os

import jax
import numpy as np

from mjrl_tpu import envs
from mjrl_tpu.models import GaussianMLP
from mjrl_tpu.utils.evaluation import evaluate_policy, export_rollout


def _setup():
    env = envs.make("point_mass")
    pol = GaussianMLP(env.spec, hidden_sizes=(8,))
    return env, pol, pol.init(jax.random.PRNGKey(0)), pol.init_transforms()


def test_evaluate_policy_stats():
    env, pol, params, tf = _setup()
    out = evaluate_policy(
        env, pol, params, tf, jax.random.PRNGKey(1), num_episodes=8,
        percentiles=(50,),
    )
    assert out["min"] <= out["p50"] <= out["max"]
    assert out["min"] <= out["mean"] <= out["max"]
    # deterministic mean-action evaluation is reproducible
    out2 = evaluate_policy(
        env, pol, params, tf, jax.random.PRNGKey(1), num_episodes=8
    )
    np.testing.assert_allclose(out["mean"], out2["mean"], rtol=1e-6)


def test_discounted_scores():
    env, pol, params, tf = _setup()
    g1 = evaluate_policy(env, pol, params, tf, jax.random.PRNGKey(1), 4, gamma=1.0)
    g9 = evaluate_policy(env, pol, params, tf, jax.random.PRNGKey(1), 4, gamma=0.9)
    # point_mass rewards are negative: discounting shrinks magnitude
    assert abs(g9["mean"]) < abs(g1["mean"])


def test_export_rollout(tmp_path):
    env, pol, params, tf = _setup()
    path = export_rollout(
        env, pol, params, tf, jax.random.PRNGKey(2), str(tmp_path / "roll.npz")
    )
    data = np.load(path)
    assert data["actions"].shape[0] == data["rewards"].shape[0]
    assert np.isfinite(data["rewards"]).all()


def test_export_rollout_physics_env_has_qpos(tmp_path):
    env = envs.make("hopper", horizon=20)
    pol = GaussianMLP(env.spec, hidden_sizes=(8,))
    path = export_rollout(
        env, pol, pol.init(jax.random.PRNGKey(0)), pol.init_transforms(),
        jax.random.PRNGKey(2), str(tmp_path / "hop.npz"), horizon=10,
    )
    data = np.load(path)
    assert data["qpos"].shape[1] == env.model.nq
