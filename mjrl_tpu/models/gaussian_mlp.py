"""Gaussian policies: tanh-MLP mean + state-independent learned log_std.

Capability twin of the reference's policy classes (reference:
mjrl/policies/gaussian_mlp.py ``MLP``, mjrl/policies/gaussian_linear.py
``LinearPolicy``): a diagonal Gaussian whose mean is an MLP (or linear map) of
the observation and whose ``log_std`` is a free parameter per action dim,
projected to ``>= min_log_std`` after every parameter update (the reference
clips the log_std entries inside ``set_param_values``; :meth:`project` is that
projection). The design is functional: the policy object holds only static
config, parameters are a pytree ``{"mlp": [...], "log_std": (da,)}``, and the
agents keep old/new copies of that pytree explicitly (the reference's
``set_old`` machinery).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from mjrl_tpu.models.mlp import (
    Transforms,
    apply_mlp,
    identity_transforms,
    init_mlp,
)
from mjrl_tpu.ops.distributions import DiagGaussian
from mjrl_tpu.types import EnvSpec

PolicyParams = Dict[str, Any]


class GaussianMLP:
    """Diagonal-Gaussian MLP policy (reference defaults: hidden (64, 64),
    ``min_log_std=-3``, ``init_log_std=0``)."""

    def __init__(
        self,
        spec: EnvSpec,
        hidden_sizes: Sequence[int] = (64, 64),
        min_log_std: float = -3.0,
        init_log_std: float = 0.0,
        dtype: Any = jnp.float32,
    ):
        self.spec = spec
        self.hidden_sizes = tuple(hidden_sizes)
        self.min_log_std = float(min_log_std)
        self.init_log_std = float(init_log_std)
        self.dtype = dtype

    # -- parameters ---------------------------------------------------------
    def init(self, key: jax.Array) -> PolicyParams:
        sizes = (self.spec.observation_dim, *self.hidden_sizes, self.spec.action_dim)
        return {
            "mlp": init_mlp(key, sizes, dtype=self.dtype),
            "log_std": jnp.full(
                (self.spec.action_dim,), self.init_log_std, dtype=self.dtype
            ),
        }

    def init_transforms(self) -> Transforms:
        return identity_transforms(
            self.spec.observation_dim, self.spec.action_dim, self.dtype
        )

    def project(self, params: PolicyParams) -> PolicyParams:
        """Clamp log_std from below — apply after every parameter update
        (the reference's in-``set_param_values`` clip)."""
        return {
            **params,
            "log_std": jnp.maximum(params["log_std"], self.min_log_std),
        }

    # -- distribution -------------------------------------------------------
    def apply(
        self, params: PolicyParams, transforms: Transforms, obs: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Distribution params ``(mean, log_std)`` for obs with any leading
        batch dims; log_std is broadcast to mean's shape."""
        mean = apply_mlp(params["mlp"], transforms, obs)
        log_std = jnp.broadcast_to(params["log_std"], mean.shape)
        return mean, log_std

    def sample(
        self,
        params: PolicyParams,
        transforms: Transforms,
        obs: jax.Array,
        key: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Sampled action + (mean, log_std, log_prob) — the reference's
        ``get_action`` returning ``agent_info``."""
        mean, log_std = self.apply(params, transforms, obs)
        action = DiagGaussian.sample(key, mean, log_std)
        log_prob = DiagGaussian.log_prob(action, mean, log_std)
        return action, mean, log_std, log_prob

    def mean_action(
        self, params: PolicyParams, transforms: Transforms, obs: jax.Array
    ) -> jax.Array:
        """Deterministic action for eval_mode rollouts (reference:
        ``get_action``'s ``evaluation`` entry)."""
        return self.apply(params, transforms, obs)[0]

    def log_prob(
        self,
        params: PolicyParams,
        transforms: Transforms,
        obs: jax.Array,
        actions: jax.Array,
    ) -> jax.Array:
        mean, log_std = self.apply(params, transforms, obs)
        return DiagGaussian.log_prob(actions, mean, log_std)


class GaussianLinear(GaussianMLP):
    """Linear-mean variant (reference: mjrl/policies/gaussian_linear.py)."""

    def __init__(
        self,
        spec: EnvSpec,
        min_log_std: float = -3.0,
        init_log_std: float = 0.0,
        dtype: Any = jnp.float32,
    ):
        super().__init__(
            spec,
            hidden_sizes=(),
            min_log_std=min_log_std,
            init_log_std=init_log_std,
            dtype=dtype,
        )
