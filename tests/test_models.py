"""Policy and baseline unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.models.baselines import (
    LinearBaseline,
    MLPBaseline,
    QuadraticBaseline,
    ZeroBaseline,
)
from mjrl_tpu.models.gaussian_mlp import GaussianLinear, GaussianMLP
from mjrl_tpu.types import EnvSpec, zeros_trajectory_batch

SPEC = EnvSpec(observation_dim=4, action_dim=2, horizon=10)


def test_policy_shapes_and_batching():
    pol = GaussianMLP(SPEC, hidden_sizes=(8, 8))
    params = pol.init(jax.random.PRNGKey(0))
    tf = pol.init_transforms()
    obs = jnp.ones((3, 7, 4))
    mean, log_std = pol.apply(params, tf, obs)
    assert mean.shape == (3, 7, 2)
    assert log_std.shape == (3, 7, 2)


def test_policy_final_layer_small_init():
    pol = GaussianMLP(SPEC, hidden_sizes=(8, 8))
    params = pol.init(jax.random.PRNGKey(0))
    tf = pol.init_transforms()
    mean, _ = pol.apply(params, tf, jnp.ones((16, 4)))
    assert float(jnp.max(jnp.abs(mean))) < 0.1  # near-zero initial mean


def test_log_std_projection():
    pol = GaussianMLP(SPEC, min_log_std=-3.0)
    params = pol.init(jax.random.PRNGKey(0))
    params["log_std"] = jnp.array([-5.0, 1.0])
    proj = pol.project(params)
    np.testing.assert_allclose(np.asarray(proj["log_std"]), [-3.0, 1.0])


def test_linear_policy_is_single_layer():
    pol = GaussianLinear(SPEC)
    params = pol.init(jax.random.PRNGKey(0))
    assert len(params["mlp"]) == 1
    assert params["mlp"][0]["w"].shape == (4, 2)


def test_policy_sample_logprob_consistency():
    pol = GaussianMLP(SPEC, hidden_sizes=(8,))
    params = pol.init(jax.random.PRNGKey(0))
    tf = pol.init_transforms()
    obs = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    action, mean, log_std, lp = pol.sample(params, tf, obs, jax.random.PRNGKey(2))
    lp2 = pol.log_prob(params, tf, obs, action)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), rtol=1e-5)


def _fit_batch(key, n=16, t=10):
    """A batch whose returns are a noiseless linear function of features."""
    batch = zeros_trajectory_batch(n, t, SPEC.observation_dim, SPEC.action_dim)
    obs = jax.random.normal(key, (n, t, SPEC.observation_dim))
    returns = 2.0 * obs[..., 0] - obs[..., 1] + 0.5
    return batch.replace(observations=obs, returns=returns)


def test_linear_baseline_fits_linear_target():
    bl = LinearBaseline(SPEC)
    state = bl.init(jax.random.PRNGKey(0))
    batch = _fit_batch(jax.random.PRNGKey(1))
    state, errs = bl.fit(state, batch, jax.random.PRNGKey(2))
    assert float(errs["VF_error_after"]) < 1e-3
    assert float(errs["VF_error_before"]) > float(errs["VF_error_after"])
    pred = bl.predict_batch(state, batch)
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(batch.returns), rtol=1e-2, atol=2e-2
    )


def test_quadratic_baseline_fits_quadratic_target():
    bl = QuadraticBaseline(SPEC)
    state = bl.init(jax.random.PRNGKey(0))
    batch = _fit_batch(jax.random.PRNGKey(1))
    obs = batch.observations
    returns = obs[..., 0] * obs[..., 1] + 0.3 * obs[..., 2]
    batch = batch.replace(returns=returns)
    state, errs = bl.fit(state, batch, jax.random.PRNGKey(2))
    assert float(errs["VF_error_after"]) < 1e-3


def test_quadratic_beats_linear_on_quadratic_target():
    batch = _fit_batch(jax.random.PRNGKey(1))
    returns = batch.observations[..., 0] * batch.observations[..., 1]
    batch = batch.replace(returns=returns)
    lin, quad = LinearBaseline(SPEC), QuadraticBaseline(SPEC)
    _, e_lin = lin.fit(lin.init(jax.random.PRNGKey(0)), batch, jax.random.PRNGKey(2))
    _, e_quad = quad.fit(quad.init(jax.random.PRNGKey(0)), batch, jax.random.PRNGKey(2))
    assert float(e_quad["VF_error_after"]) < float(e_lin["VF_error_after"])


def test_mlp_baseline_reduces_error():
    bl = MLPBaseline(SPEC, epochs=5, batch_size=32)
    state = bl.init(jax.random.PRNGKey(0))
    batch = _fit_batch(jax.random.PRNGKey(1))
    fit = jax.jit(bl.fit)
    state, errs = fit(state, batch, jax.random.PRNGKey(2))
    assert float(errs["VF_error_after"]) < float(errs["VF_error_before"])


def test_zero_baseline():
    bl = ZeroBaseline(SPEC)
    state = bl.init(jax.random.PRNGKey(0))
    batch = _fit_batch(jax.random.PRNGKey(1))
    assert float(jnp.sum(jnp.abs(bl.predict_batch(state, batch)))) == 0.0


def test_baseline_fit_ignores_padding():
    """Corrupt the padded region; the fit must not change."""
    bl = LinearBaseline(SPEC)
    batch = _fit_batch(jax.random.PRNGKey(1))
    valid = batch.valid.at[:, 5:].set(False)
    clean = batch.replace(valid=valid)
    corrupt = clean.replace(
        returns=clean.returns.at[:, 5:].set(1e6),
    )
    s1, _ = bl.fit(bl.init(jax.random.PRNGKey(0)), clean, jax.random.PRNGKey(2))
    s2, _ = bl.fit(bl.init(jax.random.PRNGKey(0)), corrupt, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(s1["coef"]), np.asarray(s2["coef"]), rtol=1e-5)
