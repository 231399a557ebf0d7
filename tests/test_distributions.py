"""Oracle tests for the diagonal-Gaussian math (SURVEY.md §4a)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from mjrl_tpu.ops.distributions import DiagGaussian


def test_log_prob_matches_scipy():
    rng = np.random.default_rng(0)
    mean = rng.normal(size=(5, 3)).astype(np.float32)
    log_std = rng.normal(scale=0.3, size=(5, 3)).astype(np.float32)
    actions = rng.normal(size=(5, 3)).astype(np.float32)
    got = np.asarray(DiagGaussian.log_prob(actions, mean, log_std))
    want = stats.norm.logpdf(actions, loc=mean, scale=np.exp(log_std)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kl_zero_when_identical():
    mean = jnp.array([[0.3, -0.7]])
    log_std = jnp.array([[0.1, -0.2]])
    kl = DiagGaussian.kl(mean, log_std, mean, log_std)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_kl_closed_form_univariate():
    # KL(N(m0,s0) || N(m1,s1)) = log(s1/s0) + (s0^2+(m0-m1)^2)/(2 s1^2) - 1/2
    m0, s0, m1, s1 = 0.5, 1.2, -0.3, 0.8
    want = np.log(s1 / s0) + (s0**2 + (m0 - m1) ** 2) / (2 * s1**2) - 0.5
    got = DiagGaussian.kl(
        jnp.array([m0]), jnp.array([np.log(s0)]), jnp.array([m1]), jnp.array([np.log(s1)])
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_kl_monte_carlo():
    key = jax.random.PRNGKey(1)
    old_mean = jnp.array([0.2, -0.1, 0.5])
    old_ls = jnp.array([0.0, -0.5, 0.3])
    new_mean = jnp.array([0.0, 0.1, 0.4])
    new_ls = jnp.array([0.1, -0.4, 0.2])
    x = DiagGaussian.sample(key, jnp.broadcast_to(old_mean, (200_000, 3)), old_ls)
    mc = jnp.mean(
        DiagGaussian.log_prob(x, old_mean, old_ls)
        - DiagGaussian.log_prob(x, new_mean, new_ls)
    )
    analytic = DiagGaussian.kl(old_mean, old_ls, new_mean, new_ls)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(analytic), rtol=2e-2)


def test_sample_moments():
    key = jax.random.PRNGKey(2)
    mean = jnp.array([1.0, -2.0])
    log_std = jnp.array([0.0, 0.5])
    x = DiagGaussian.sample(key, jnp.broadcast_to(mean, (100_000, 2)), log_std)
    np.testing.assert_allclose(np.asarray(jnp.mean(x, 0)), np.asarray(mean), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(jnp.std(x, 0)), np.exp(np.asarray(log_std)), rtol=2e-2
    )


def test_entropy():
    log_std = jnp.array([0.0, 0.5, -1.0])
    want = np.sum(np.asarray(log_std) + 0.5 * (1 + np.log(2 * np.pi)))
    np.testing.assert_allclose(np.asarray(DiagGaussian.entropy(log_std)), want, rtol=1e-6)


def test_likelihood_ratio_at_same_params_is_one():
    mean = jnp.ones((4, 2))
    ls = jnp.zeros((4, 2))
    a = jnp.full((4, 2), 0.3)
    lr = DiagGaussian.likelihood_ratio(a, mean, ls, mean, ls)
    np.testing.assert_allclose(np.asarray(lr), 1.0, rtol=1e-6)
