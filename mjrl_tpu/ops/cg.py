"""Conjugate-gradient solver for Fisher systems, fully on device.

Textbook CG on the flat parameter vector (reference: mjrl/utils/cg_solve.py
``cg_solve(f_Ax, b, x_0, cg_iters=10, residual_tol=1e-10)``), implemented as a
``lax.while_loop`` so the whole NPG update — including every Fisher-vector
product the loop makes — stays inside one jitted program with no host
round-trips. Under ``pjit`` the FVP closure carries its own ``psum``-style
reductions (emitted by the partitioner), so every device runs an identical CG
trajectory on the replicated flat vector.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cg_solve(
    f_Ax: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x_0: jax.Array | None = None,
    cg_iters: int = 10,
    residual_tol: float = 1e-10,
) -> jax.Array:
    """Solve ``A x = b`` given only the matvec ``f_Ax``.

    Mirrors the reference exactly — including its loop order (check
    ``rdotr < tol`` on entry, update ``x`` then recompute the residual) — so
    iterate-for-iterate numerics match up to dtype.
    """
    x = jnp.zeros_like(b) if x_0 is None else x_0
    r = b - (f_Ax(x) if x_0 is not None else jnp.zeros_like(b))
    p = r
    rdotr = jnp.dot(r, r)

    def cond(state):
        i, _, _, _, rdotr = state
        return jnp.logical_and(i < cg_iters, rdotr >= residual_tol)

    def body(state):
        i, x, r, p, rdotr = state
        z = f_Ax(p)
        v = rdotr / jnp.dot(p, z)
        x = x + v * p
        r = r - v * z
        newrdotr = jnp.dot(r, r)
        mu = newrdotr / rdotr
        p = r + mu * p
        return i + 1, x, r, p, newrdotr

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (jnp.array(0), x, r, p, rdotr))
    return x
