"""PPO-clip: multi-epoch minibatch Adam on the clipped surrogate.

Capability twin of the reference's PPO (reference: mjrl/algos/ppo_clip.py,
ctor ``clip_coef=0.2, epochs=10, mb_size=64, learn_rate=3e-4`` with torch
Adam): maximize ``mean(min(LR * adv, clip(LR, 1±eps) * adv))`` over shuffled
minibatches of the on-policy batch.

TPU-first: the epochs x minibatches double loop is a nested ``lax.scan`` over
a precomputed permutation tensor, so the whole multi-epoch optimization is
one XLA program — minibatch gradients are small dense matmul backprops that
tile straight onto the MXU. The behavior distribution (``batch.mean/log_std``
recorded at sampling time) provides the ratio denominator, so minibatch
normalization needs no old-policy re-evaluation.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from mjrl_tpu.algos.base import AgentState, BatchREINFORCE
from mjrl_tpu.ops.distributions import DiagGaussian
from mjrl_tpu.types import TrajectoryBatch


class PPO(BatchREINFORCE):
    def __init__(
        self,
        env,
        policy,
        baseline,
        clip_coef: float = 0.2,
        epochs: int = 10,
        mb_size: int = 64,
        learn_rate: float = 3e-4,
        **kwargs: Any,
    ):
        super().__init__(env, policy, baseline, learn_rate=learn_rate, **kwargs)
        self.clip_coef = clip_coef
        self.epochs = epochs
        self.mb_size = mb_size
        self.optimizer = optax.adam(learn_rate)

    def init_opt_state(self, params):
        return self.optimizer.init(params)

    def update(
        self, state: AgentState, batch: TrajectoryBatch, key: jax.Array
    ) -> Tuple[AgentState, Dict[str, jax.Array]]:
        surr_before = self.surrogate(state.params, state.transforms, batch)
        m = batch.num_envs * batch.horizon
        obs = batch.observations.reshape(m, -1)
        act = batch.actions.reshape(m, -1)
        adv = batch.advantages.reshape(m)
        old_mean = batch.mean.reshape(m, -1)
        old_log_std = batch.log_std.reshape(m, -1)
        validf = batch.valid.reshape(m).astype(adv.dtype)

        mb = min(self.mb_size, m)
        num_mb = max(m // mb, 1)
        transforms = state.transforms

        def mb_loss(params, idx):
            new_mean, new_log_std = self.policy.apply(params, transforms, obs[idx])
            lr = DiagGaussian.likelihood_ratio(
                act[idx], new_mean, new_log_std, old_mean[idx], old_log_std[idx]
            )
            a = adv[idx]
            clipped = jnp.clip(lr, 1.0 - self.clip_coef, 1.0 + self.clip_coef)
            obj = jnp.minimum(lr * a, clipped * a) * validf[idx]
            return -jnp.sum(obj) / jnp.maximum(jnp.sum(validf[idx]), 1.0)

        def epoch(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, m)[: num_mb * mb].reshape(num_mb, mb)

            def mb_step(c, idx):
                p, o = c
                g = jax.grad(mb_loss)(p, idx)
                updates, o = self.optimizer.update(g, o, p)
                p = self.policy.project(optax.apply_updates(p, updates))
                return (p, o), ()

            carry, _ = jax.lax.scan(mb_step, (params, opt_state), perm)
            return carry, ()

        (params, opt_state), _ = jax.lax.scan(
            epoch,
            (state.params, state.opt_state),
            jax.random.split(key, self.epochs),
        )

        kl_dist = self.mean_kl(params, state.params, state.transforms, batch)
        surr_after = self.surrogate(params, state.transforms, batch)
        state = state.replace(
            params=params,
            old_params=jax.tree.map(jnp.copy, params),
            opt_state=opt_state,
        )
        return state, {
            "alpha": jnp.asarray(self.learn_rate),
            "kl_dist": kl_dist,
            "surr_improvement": surr_after - surr_before,
        }
