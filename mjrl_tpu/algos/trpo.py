"""TRPO: the NPG direction plus a backtracking KL line search.

Capability twin of the reference's TRPO (reference: mjrl/algos/trpo.py,
ctor ``kl_dist=0.01``): take the CG natural-gradient direction, then shrink
the step exponentially until the surrogate improves AND ``KL(old || new) <=
kl_dist``; restore the old parameters if no step in the ladder qualifies.

The line search runs as a ``lax.while_loop`` over scalars entirely on
device — each probe re-evaluates the masked surrogate and mean-KL on the
batch, so under pjit all devices walk the identical ladder (the global
surrogate/KL reductions are the TRPO reduction points of SURVEY.md §5.8).
The backtrack ratio/count are exposed because the reference fork's exact
values are unverified (SURVEY.md §7.4).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mjrl_tpu.algos.base import AgentState
from mjrl_tpu.algos.npg import NPG
from mjrl_tpu.types import TrajectoryBatch


class TRPO(NPG):
    def __init__(
        self,
        env,
        policy,
        baseline,
        kl_dist: float = 0.01,
        backtrack_ratio: float = 0.5,
        max_backtracks: int = 10,
        **kwargs: Any,
    ):
        # The KL budget doubles as NPG's normalized step size for the
        # initial alpha (the reference passes kl_dist through as delta).
        super().__init__(
            env, policy, baseline, normalized_step_size=kl_dist, **kwargs
        )
        self.kl_dist = kl_dist
        self.backtrack_ratio = backtrack_ratio
        self.max_backtracks = max_backtracks

    def update(
        self, state: AgentState, batch: TrajectoryBatch, key: jax.Array
    ) -> Tuple[AgentState, Dict[str, jax.Array]]:
        surr_before = self.surrogate(state.params, state.transforms, batch)
        npg_flat, alpha0, flat, unravel = self.step_direction(state, batch, key)

        def eval_candidate(alpha):
            cand = self.policy.project(unravel(flat + alpha * npg_flat))
            surr = self.surrogate(cand, state.transforms, batch)
            kl = self.mean_kl(cand, state.params, state.transforms, batch)
            ok = jnp.logical_and(surr > surr_before, kl <= self.kl_dist)
            return ok, surr, kl

        def cond(carry):
            k, alpha, ok, _, _ = carry
            return jnp.logical_and(k < self.max_backtracks, jnp.logical_not(ok))

        def body(carry):
            k, alpha, _, _, _ = carry
            ok, surr, kl = eval_candidate(alpha)
            next_alpha = jnp.where(ok, alpha, alpha * self.backtrack_ratio)
            return k + 1, jnp.where(ok, alpha, next_alpha), ok, surr, kl

        init = (
            jnp.zeros((), jnp.int32),
            alpha0,
            jnp.zeros((), bool),
            surr_before,
            jnp.zeros(()),
        )
        k, alpha, accepted, surr_after, kl = jax.lax.while_loop(cond, body, init)

        # Accepted -> step with the found alpha; rejected -> keep old params
        # (the reference restores the pre-update parameter vector).
        alpha_eff = jnp.where(accepted, alpha, 0.0)
        new_params = self.policy.project(unravel(flat + alpha_eff * npg_flat))
        state = state.replace(
            params=new_params, old_params=jax.tree.map(jnp.copy, new_params)
        )
        return state, {
            "alpha": alpha_eff,
            "delta": jnp.asarray(self.kl_dist),
            "kl_dist": jnp.where(accepted, kl, 0.0),
            "surr_improvement": jnp.where(accepted, surr_after - surr_before, 0.0),
            "backtrack_iters": k.astype(jnp.float32),
            "step_accepted": accepted.astype(jnp.float32),
        }
