"""Batched physics dispatch: vmap'ed env steps ride the SoA/Pallas fast path.

The sampler's shape is ``lax.scan`` over time of ``jax.vmap(env.step)`` over
envs (samplers/rollout.py). Under plain vmap the per-env engine keeps its
tiny feature dims (3, 6, nv) in the TPU lane dimension and wastes ~95% of
the VPU (see physics/soa.py). This module makes the batched case take the
batch-LAST SoA pipeline instead — as a single Pallas mega-kernel per control
step on TPU — without changing any env/sampler code structure:

``make_frame_stepper(model, frame_skip)`` returns a per-env function
``(q, qd, ctrl) -> (q, qd)`` advancing ``frame_skip`` control frames. It is
a ``jax.custom_batching.custom_vmap``: called unbatched it runs the
reference per-env engine; under ``vmap`` its batching rule transposes to
``(rows, B)`` and runs the whole ``frame_skip x n_substeps`` window in one
SoA pass (Pallas kernel on TPU backends, plain jit elsewhere).

Models outside the SoA feature set (ball joints, tendons, box-box
contacts — ``soa.soa_supported``) just return the per-env loop and vmap
normally. Set ``MJRL_TPU_NO_SOA=1`` to force the fallback everywhere (A/B
debugging).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from mjrl_tpu.physics import soa
from mjrl_tpu.physics.engine import PhysicsState, step as engine_step
from mjrl_tpu.physics.model import Model

# Above this many substeps per window the SoA body is wrapped in fori_loop
# instead of fully unrolled (compile-time / instruction-count bound).
_UNROLL_MAX = 8


def make_frame_stepper(
    model: Model,
    frame_skip: int,
    subspaces=None,
    use_soa: Optional[bool] = None,
) -> Callable[[jax.Array, jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Per-env ``(q, qd, ctrl) -> (q, qd)`` over ``frame_skip`` frames."""

    def per_env(q, qd, ctrl):
        ps = PhysicsState(q=q, qd=qd)
        for _ in range(frame_skip):
            ps = engine_step(model, ps, ctrl, subspaces=subspaces)
        return ps.q, ps.qd

    if use_soa is None:
        use_soa = os.environ.get("MJRL_TPU_NO_SOA", "0") != "1"
    if not (use_soa and soa.soa_supported(model)):
        return per_env

    if model.constraint_solver == "newton":
        # solver parameters (invweight0 etc.) are trace-time numpy
        # constants; materialize them eagerly before any Pallas trace
        from mjrl_tpu.physics.csolve import ensure_solver_params

        ensure_solver_params(model)

    total_substeps = frame_skip * model.n_substeps

    @jax.custom_batching.custom_vmap
    def frame_step(q, qd, ctrl):
        return per_env(q, qd, ctrl)

    @frame_step.def_vmap
    def _rule(axis_size, in_batched, q, qd, ctrl):
        qb, qdb, cb = in_batched
        if not qb:
            q = jnp.broadcast_to(q, (axis_size,) + q.shape)
        if not qdb:
            qd = jnp.broadcast_to(qd, (axis_size,) + qd.shape)
        if not cb:
            ctrl = jnp.broadcast_to(ctrl, (axis_size,) + ctrl.shape)
        if jax.default_backend() == "tpu":
            from mjrl_tpu.physics.pkernel import multistep_pallas

            q2, qd2 = multistep_pallas(model, q.T, qd.T, ctrl.T, frame_skip)
        else:
            q2, qd2 = soa.multistep(
                model,
                q.T,
                qd.T,
                ctrl.T,
                frame_skip,
                unroll=total_substeps <= _UNROLL_MAX,
            )
        return (q2.T, qd2.T), (True, True)

    return frame_step
