"""DAPG: demo-augmented natural policy gradient.

Capability twin of the reference's DAPG (reference: mjrl/algos/dapg.py, ctor
``demo_paths, lam_0=1.0, lam_1=0.95``): every demo transition receives the
synthetic advantage ``lam_0 * lam_1^k * max(sampled advantages)`` (decaying
over training iteration k), the vanilla policy gradient is computed over the
UNION of sampled and demo data, while the Fisher matrix / CG system uses the
sampled data only. The full pipeline is BC warm start (stage 1) followed by
DAPG iterations (stage 2), demos shared between both.

Fixed-shape note: the union gradient is formed as the sample-count-weighted
combination of the two masked surrogates (identical to concatenating, since
the reference's surrogate is a flat mean over the union). The demo ratio
denominator is the current policy evaluated on demo states (the reference
recomputes ``old_dist_info`` on the union with current params — demos carry
no behavior distribution).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mjrl_tpu.algos.base import AgentState
from mjrl_tpu.algos.npg import NPG
from mjrl_tpu.ops.cg import cg_solve
from mjrl_tpu.ops.distributions import DiagGaussian
from mjrl_tpu.ops.ravel import ravel_pytree
from mjrl_tpu.types import TrajectoryBatch


class DAPG(NPG):
    def __init__(
        self,
        env,
        policy,
        baseline,
        demo_batch: TrajectoryBatch = None,
        lam_0: float = 1.0,
        lam_1: float = 0.95,
        **kwargs: Any,
    ):
        super().__init__(env, policy, baseline, **kwargs)
        self.demo_batch = demo_batch
        self.lam_0 = lam_0
        self.lam_1 = lam_1

    def _demo_surrogate(
        self, params: Any, transforms: Any, demo_adv: jax.Array
    ) -> jax.Array:
        """Masked-mean likelihood-ratio surrogate over demo transitions,
        denominator = stop-grad current policy on demo states."""
        d = self.demo_batch
        new_mean, new_log_std = self.policy.apply(params, transforms, d.observations)
        old_mean = jax.lax.stop_gradient(new_mean)
        old_log_std = jax.lax.stop_gradient(new_log_std)
        lr = DiagGaussian.likelihood_ratio(
            d.actions, new_mean, new_log_std, old_mean, old_log_std
        )
        w = d.valid.astype(lr.dtype)
        return jnp.sum(lr * demo_adv * w) / jnp.maximum(jnp.sum(w), 1.0)

    def update(
        self, state: AgentState, batch: TrajectoryBatch, key: jax.Array
    ) -> Tuple[AgentState, Dict[str, jax.Array]]:
        if self.demo_batch is None:
            return super().update(state, batch, key)

        d = self.demo_batch
        validf = batch.valid.astype(batch.advantages.dtype)
        n_s = jnp.maximum(jnp.sum(validf), 1.0)
        n_d = jnp.maximum(jnp.sum(d.valid.astype(validf.dtype)), 1.0)

        # Synthetic demo advantage: lam_0 * lam_1^k * max over sampled advs.
        big = jnp.asarray(jnp.finfo(validf.dtype).max, validf.dtype)
        max_adv = jnp.max(jnp.where(batch.valid, batch.advantages, -big))
        decay = self.lam_0 * jnp.power(
            jnp.asarray(self.lam_1), state.iteration.astype(jnp.float32)
        )
        demo_adv = decay * max_adv

        def union_surrogate(params):
            surr_s = self.surrogate(params, state.transforms, batch)
            surr_d = self._demo_surrogate(params, state.transforms, demo_adv)
            return (n_s * surr_s + n_d * surr_d) / (n_s + n_d)

        surr_before = self.surrogate(state.params, state.transforms, batch)
        grads = jax.grad(union_surrogate)(state.params)
        vpg_flat, _ = ravel_pytree(grads)

        # Fisher / CG on sampled data only (reference: dapg.py).
        fvp, flat, unravel = self.build_fvp(state, batch, key)
        npg_flat = cg_solve(
            fvp, vpg_flat, cg_iters=self.cg_iters, residual_tol=self.residual_tol
        )
        inner = jnp.abs(jnp.dot(vpg_flat, npg_flat))
        alpha = jnp.sqrt(2.0 * self.normalized_step_size / (inner + 1e-20))

        new_params = self.policy.project(unravel(flat + alpha * npg_flat))
        kl_dist = self.mean_kl(new_params, state.params, state.transforms, batch)
        surr_after = self.surrogate(new_params, state.transforms, batch)
        state = state.replace(
            params=new_params, old_params=jax.tree.map(jnp.copy, new_params)
        )
        return state, {
            "alpha": alpha,
            "delta": jnp.asarray(self.normalized_step_size),
            "kl_dist": kl_dist,
            "surr_improvement": surr_after - surr_before,
            "demo_coef": decay,
        }
