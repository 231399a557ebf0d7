"""Agent tests: FVP vs materialized Fisher, learning on point_mass, BC/DAPG.

SURVEY.md §4 implications: (a) FVP against the explicitly-materialized
KL Hessian on a tiny policy, (c) single-chip integration — point-mass NPG
reaches a score threshold in fixed iterations from a fixed seed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjrl_tpu import envs
from mjrl_tpu.algos import BC, DAPG, NPG, PPO, TRPO, BatchREINFORCE
from mjrl_tpu.models import GaussianMLP, QuadraticBaseline
from mjrl_tpu.ops.ravel import ravel_pytree
from mjrl_tpu.samplers import sample_episodes
from mjrl_tpu.types import EnvSpec, zeros_trajectory_batch


def _train(agent, iters, seed=0):
    state = agent.init(jax.random.PRNGKey(seed))
    step = agent.jitted_train_step
    first = None
    metrics = None
    for i in range(iters):
        state, metrics = step(state, jax.random.PRNGKey(1000 + i))
        if i == 0:
            first = float(metrics["stoc_pol_mean"])
    return state, first, metrics


def _point_mass_setup(hidden=(32, 32)):
    env = envs.make("point_mass")
    pol = GaussianMLP(env.spec, hidden_sizes=hidden)
    bl = QuadraticBaseline(env.spec)
    return env, pol, bl


def test_fvp_matches_materialized_fisher():
    """The CG matvec == damping + Hessian of mean-KL, checked densely."""
    env, pol, bl = _point_mass_setup(hidden=(4,))
    agent = NPG(env, pol, bl, num_traj=4, FIM_invert_args={"damping": 1e-2})
    state = agent.init(jax.random.PRNGKey(0))
    batch = agent.sample_batch(state, jax.random.PRNGKey(1))
    batch = agent.process_batch(state, batch)

    fvp, flat, unravel = agent.build_fvp(state, batch, jax.random.PRNGKey(2))

    def kl_of_flat(p):
        return agent.mean_kl(unravel(p), state.params, state.transforms, batch)

    hess = jax.hessian(kl_of_flat)(flat)
    v = jax.random.normal(jax.random.PRNGKey(3), flat.shape)
    want = hess @ v + 1e-2 * v
    got = fvp(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)


def test_fisher_is_psd_at_current_params():
    env, pol, bl = _point_mass_setup(hidden=(4,))
    agent = NPG(env, pol, bl, num_traj=4)
    state = agent.init(jax.random.PRNGKey(0))
    batch = agent.process_batch(
        state, agent.sample_batch(state, jax.random.PRNGKey(1))
    )
    flat, unravel = ravel_pytree(state.params)

    def kl_of_flat(p):
        return agent.mean_kl(unravel(p), state.params, state.transforms, batch)

    hess = np.asarray(jax.hessian(kl_of_flat)(flat))
    eigs = np.linalg.eigvalsh(hess)
    assert eigs.min() > -1e-4  # PSD up to float noise
    # KL gradient vanishes at old == new
    g = np.asarray(jax.grad(kl_of_flat)(flat))
    np.testing.assert_allclose(g, 0.0, atol=1e-5)


def test_npg_learns_point_mass():
    env, pol, bl = _point_mass_setup()
    agent = NPG(env, pol, bl, normalized_step_size=0.05, num_traj=32)
    state, first, metrics = _train(agent, 15)
    assert float(metrics["running_score"]) > first + 20.0
    assert float(metrics["kl_dist"]) > 0.0
    assert np.isfinite(float(metrics["alpha"]))


def test_trpo_respects_kl_budget_and_learns():
    env, pol, bl = _point_mass_setup()
    agent = TRPO(env, pol, bl, kl_dist=0.05, num_traj=32)
    kls = []
    state = agent.init(jax.random.PRNGKey(0))
    step = agent.jitted_train_step
    first = None
    for i in range(15):
        state, m = step(state, jax.random.PRNGKey(1000 + i))
        if i == 0:
            first = float(m["stoc_pol_mean"])
        if float(m["step_accepted"]) == 1.0:
            kls.append(float(m["kl_dist"]))
    assert kls, "TRPO accepted no steps"
    assert max(kls) <= 0.05 + 1e-4
    assert float(m["running_score"]) > first + 20.0


def test_ppo_learns_point_mass():
    env, pol, bl = _point_mass_setup()
    agent = PPO(env, pol, bl, epochs=5, mb_size=128, learn_rate=1e-3, num_traj=32)
    state, first, metrics = _train(agent, 15)
    assert float(metrics["running_score"]) > first + 20.0


def test_reinforce_step_runs_and_is_finite():
    env, pol, bl = _point_mass_setup(hidden=(8,))
    agent = BatchREINFORCE(env, pol, bl, learn_rate=0.01, num_traj=8)
    state, _, metrics = _train(agent, 2)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(state.iteration) == 2


def test_samples_mode_autoreset_training():
    env, pol, bl = _point_mass_setup(hidden=(16,))
    agent = NPG(
        env, pol, bl,
        normalized_step_size=0.05,
        num_traj=16,
        num_samples=800,
        sample_mode="samples",
    )
    state, first, metrics = _train(agent, 10)
    assert float(metrics["running_score"]) > first
    assert float(metrics["num_samples"]) == 16 * 50  # ceil(800/16) steps


def _scripted_expert_batch(env, key, num=32):
    """Demos from a hand-scripted proportional controller on point_mass."""

    class _Expert:
        def apply(self, params, tf, obs):
            # obs = [pos, vel, target-pos]; PD control toward the target
            mean = 0.8 * obs[..., 4:6] - 0.15 * obs[..., 2:4]
            return mean, jnp.full_like(mean, -2.0)

    pol = GaussianMLP(env.spec)  # only used for spec plumbing
    expert = _Expert()
    from mjrl_tpu.samplers.rollout import sample_episodes as se

    return se(env, expert, None, None, key, num)


def test_bc_clones_expert():
    env = envs.make("point_mass")
    demos = _scripted_expert_batch(env, jax.random.PRNGKey(0))
    pol = GaussianMLP(env.spec, hidden_sizes=(32, 32))
    params = pol.init(jax.random.PRNGKey(1))
    tf = pol.init_transforms()
    bc = BC(demos, pol, epochs=100, batch_size=128, loss_type="MSE")
    train = jax.jit(bc.train)
    params, tf, metrics = train(params, tf, jax.random.PRNGKey(2))
    assert float(metrics["loss_after"]) < 0.15 * float(metrics["loss_before"])
    # cloned policy must track the expert's actions on demo states
    mean, _ = pol.apply(params, tf, demos.observations)
    err = jnp.sqrt(jnp.mean(jnp.square(mean - demos.mean)))
    assert float(err) < 0.15


def test_bc_mle_loss_decreases():
    env = envs.make("point_mass")
    demos = _scripted_expert_batch(env, jax.random.PRNGKey(0), num=16)
    pol = GaussianMLP(env.spec, hidden_sizes=(16,))
    params = pol.init(jax.random.PRNGKey(1))
    bc = BC(demos, pol, epochs=10, batch_size=128, loss_type="MLE")
    params, tf, metrics = jax.jit(bc.train)(
        params, pol.init_transforms(), jax.random.PRNGKey(2)
    )
    assert float(metrics["loss_after"]) < float(metrics["loss_before"])


def test_dapg_demo_coef_decays_and_learns():
    env = envs.make("point_mass")
    demos = _scripted_expert_batch(env, jax.random.PRNGKey(0), num=16)
    pol = GaussianMLP(env.spec, hidden_sizes=(32, 32))
    bl = QuadraticBaseline(env.spec)
    agent = DAPG(
        env, pol, bl, demo_batch=demos,
        lam_0=1.0, lam_1=0.9,
        normalized_step_size=0.05, num_traj=32,
    )
    state = agent.init(jax.random.PRNGKey(0))
    step = agent.jitted_train_step
    coefs = []
    first = None
    for i in range(10):
        state, m = step(state, jax.random.PRNGKey(1000 + i))
        coefs.append(float(m["demo_coef"]))
        if i == 0:
            first = float(m["stoc_pol_mean"])
    assert all(a > b for a, b in zip(coefs, coefs[1:]))  # lam_1^k decay
    np.testing.assert_allclose(coefs[0], 1.0, rtol=1e-5)  # lam_0 * lam_1^0
    assert float(m["running_score"]) > first


def test_train_step_is_deterministic():
    env, pol, bl = _point_mass_setup(hidden=(8,))
    agent = NPG(env, pol, bl, num_traj=8)
    s1, _, m1 = _train(agent, 3, seed=5)
    s2, _, m2 = _train(agent, 3, seed=5)
    f1, _ = ravel_pytree(s1.params)
    f2, _ = ravel_pytree(s2.params)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_ppo_modern_machinery_flags():
    """lr_anneal_iters + norm_adv_per_minibatch + MLPBaseline vf clipping:
    all three round-3 flags run together, alpha anneals linearly to 0, and
    the agent still learns point_mass."""
    from mjrl_tpu.models import MLPBaseline

    env, pol, _ = _point_mass_setup()
    bl = MLPBaseline(env.spec, epochs=2, batch_size=128, vf_clip_coef=0.2)
    agent = PPO(
        env,
        pol,
        bl,
        epochs=5,
        mb_size=128,
        learn_rate=1e-3,
        num_traj=32,
        lr_anneal_iters=10,
        norm_adv_per_minibatch=True,
    )
    state = agent.init(jax.random.PRNGKey(0))
    step = agent.jitted_train_step
    alphas, first = [], None
    for i in range(10):
        state, metrics = step(state, jax.random.PRNGKey(2000 + i))
        alphas.append(float(metrics["alpha"]))
        if i == 0:
            first = float(metrics["stoc_pol_mean"])
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    # linear anneal: alpha_i = lr * (1 - i/10)
    np.testing.assert_allclose(
        alphas, [1e-3 * (1 - i / 10) for i in range(10)], rtol=1e-5
    )
    assert float(metrics["running_score"]) > first
