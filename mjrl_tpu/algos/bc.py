"""Behavior cloning: supervised warm-start on expert demonstrations.

Capability twin of the reference's BC (reference:
mjrl/algos/behavior_cloning.py, ctor ``epochs=5, batch_size=64, lr=1e-3,
loss_type in {MSE, MLE}``): compute input/output normalization statistics
from the demos and install them as the policy's shift-scale transforms
(the reference's ``policy.model.set_transformations``), then minibatch-Adam
either the mean-squared error of the policy mean or the negative
log-likelihood of the demo actions.

The whole fit is one jitted nested ``lax.scan`` (epochs x minibatches);
padded demo steps carry zero weight. Used standalone or as DAPG's stage 1.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from mjrl_tpu.models.gaussian_mlp import GaussianMLP
from mjrl_tpu.ops.gae import masked_mean_std
from mjrl_tpu.types import TrajectoryBatch


class BC:
    def __init__(
        self,
        expert_batch: TrajectoryBatch,
        policy: GaussianMLP,
        epochs: int = 5,
        batch_size: int = 64,
        lr: float = 1e-3,
        loss_type: str = "MSE",
        set_transforms: bool = True,
    ):
        assert loss_type in ("MSE", "MLE")
        self.expert_batch = expert_batch
        self.policy = policy
        self.epochs = epochs
        self.batch_size = batch_size
        self.loss_type = loss_type
        self.set_transforms = set_transforms
        self.optimizer = optax.adam(lr)

    def compute_transforms(self) -> Dict[str, jax.Array]:
        """Demo-derived shift/scale (reference: BC ctor -> set_transformations)."""
        b = self.expert_batch
        m = b.num_envs * b.horizon
        obs = b.observations.reshape(m, -1)
        act = b.actions.reshape(m, -1)
        w = b.valid.reshape(m).astype(obs.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)

        def stats(x):
            mean = jnp.sum(x * w[:, None], axis=0) / n
            var = jnp.sum(jnp.square(x - mean) * w[:, None], axis=0) / n
            return mean, jnp.sqrt(var)

        in_shift, in_scale = stats(obs)
        out_shift, out_scale = stats(act)
        return {
            "in_shift": in_shift,
            "in_scale": in_scale + 1e-8,
            "out_shift": out_shift,
            "out_scale": out_scale + 1e-8,
        }

    def loss(self, params, transforms, obs, act, w) -> jax.Array:
        if self.loss_type == "MSE":
            mean, _ = self.policy.apply(params, transforms, obs)
            per = jnp.sum(jnp.square(mean - act), axis=-1)
        else:  # MLE: the reference's ``-mean_LL``
            per = -self.policy.log_prob(params, transforms, obs, act)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

    def train(
        self, params: Any, transforms: Any, key: jax.Array
    ) -> Tuple[Any, Any, Dict[str, jax.Array]]:
        """Returns (params, transforms, metrics). Jittable end to end."""
        if self.set_transforms:
            transforms = self.compute_transforms()
        b = self.expert_batch
        m = b.num_envs * b.horizon
        obs = b.observations.reshape(m, -1)
        act = b.actions.reshape(m, -1)
        w = b.valid.reshape(m).astype(obs.dtype)

        mb = min(self.batch_size, m)
        num_mb = max(m // mb, 1)
        opt_state = self.optimizer.init(params)

        loss_before = self.loss(params, transforms, obs, act, w)

        def epoch(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, m)[: num_mb * mb].reshape(num_mb, mb)

            def mb_step(c, idx):
                p, o = c
                g = jax.grad(self.loss)(p, transforms, obs[idx], act[idx], w[idx])
                updates, o = self.optimizer.update(g, o, p)
                p = self.policy.project(optax.apply_updates(p, updates))
                return (p, o), ()

            carry, _ = jax.lax.scan(mb_step, (params, opt_state), perm)
            return carry, ()

        (params, _), _ = jax.lax.scan(
            epoch, (params, opt_state), jax.random.split(key, self.epochs)
        )
        loss_after = self.loss(params, transforms, obs, act, w)
        return params, transforms, {
            "loss_before": loss_before,
            "loss_after": loss_after,
        }
