"""Diagonal-Gaussian policy distribution math.

Closed forms for sampling, log-likelihood, likelihood ratio, KL and entropy of
``N(mean, diag(exp(log_std))^2)`` — the distribution family of the reference's
Gaussian MLP/linear policies (reference: mjrl/policies/gaussian_mlp.py
``mean_LL`` / ``likelihood_ratio`` / ``mean_kl``). Everything is elementwise +
reductions, so XLA fuses it into adjacent matmuls; all functions broadcast over
arbitrary leading batch dims.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


class DiagGaussian:
    """Stateless namespace of diagonal-Gaussian ops (mean, log_std params)."""

    @staticmethod
    def sample(key: jax.Array, mean: jax.Array, log_std: jax.Array) -> jax.Array:
        """Reparameterized sample ``mean + exp(log_std) * eps``."""
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return mean + jnp.exp(log_std) * eps

    @staticmethod
    def log_prob(actions: jax.Array, mean: jax.Array, log_std: jax.Array) -> jax.Array:
        """Per-sample log-likelihood, reduced over the action dim.

        Matches the reference's ``mean_LL`` integrand
        (mjrl/policies/gaussian_mlp.py): ``-0.5*||(a-mu)/sigma||^2
        - sum(log_std) - (da/2)*log(2*pi)``.
        """
        z = (actions - mean) * jnp.exp(-log_std)
        return (
            -0.5 * jnp.sum(jnp.square(z), axis=-1)
            - jnp.sum(log_std, axis=-1)
            - 0.5 * _LOG_2PI * actions.shape[-1]
        )

    @staticmethod
    def likelihood_ratio(
        actions: jax.Array,
        new_mean: jax.Array,
        new_log_std: jax.Array,
        old_mean: jax.Array,
        old_log_std: jax.Array,
    ) -> jax.Array:
        """``exp(LL_new - LL_old)`` per sample (reference: likelihood_ratio)."""
        ll_new = DiagGaussian.log_prob(actions, new_mean, new_log_std)
        ll_old = DiagGaussian.log_prob(actions, old_mean, old_log_std)
        return jnp.exp(ll_new - ll_old)

    @staticmethod
    def kl(
        old_mean: jax.Array,
        old_log_std: jax.Array,
        new_mean: jax.Array,
        new_log_std: jax.Array,
    ) -> jax.Array:
        """Per-sample ``KL(old || new)``, reduced over the action dim.

        Same direction and form as the reference's ``kl_divergence``
        (rllab-lineage, mjrl/policies/gaussian_mlp.py):
        ``sum[ (sig_o^2 + (mu_o-mu_n)^2) / (2 sig_n^2) + ls_n - ls_o ] - da/2``.
        """
        var_ratio = jnp.exp(2.0 * (old_log_std - new_log_std))
        mean_term = jnp.square(new_mean - old_mean) * jnp.exp(-2.0 * new_log_std)
        per_dim = 0.5 * (var_ratio + mean_term) + new_log_std - old_log_std - 0.5
        return jnp.sum(per_dim, axis=-1)

    @staticmethod
    def entropy(log_std: jax.Array) -> jax.Array:
        """Per-sample entropy, reduced over the action dim."""
        return jnp.sum(log_std + 0.5 * (1.0 + _LOG_2PI), axis=-1)
