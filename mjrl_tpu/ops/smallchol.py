"""Batched tiny-SPD Cholesky solve, scalarized for the TPU VPU.

``jax.scipy.linalg.cho_factor/cho_solve`` on a (B, n, n) batch of tiny
matrices lowers to sequential column steps over padded (B, 8, 128) tiles —
for n<=~32 the padding wastes ~98% of every vector op and the triangular
solves serialize. This implementation unrolls the n^3/3 Cholesky recurrence
at trace time over the individual matrix entries, each a (B,)-shaped vector:
XLA fuses the resulting elementwise chains into a handful of full-lane VPU
kernels with zero padding waste. For the physics engine's per-env mass
matrices (nv <= ~30, B = thousands of envs) this is the difference between
the solve dominating a substep and it being ~free (SURVEY.md §7.2 step 9's
"batched small-matrix Cholesky" hot spot, solved at the XLA level).

Falls back to ``cho_solve`` for n > MAX_UNROLL where trace size would blow
up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_UNROLL = 40


def chol_solve_small(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``A x = b`` for SPD ``A``: shapes (..., n, n) and (..., n).

    The batch dims are arbitrary; entries are unstacked to (batch,)-shaped
    scalars at trace time.
    """
    n = A.shape[-1]
    if n > MAX_UNROLL:
        chol = jax.scipy.linalg.cho_factor(A)
        return jax.scipy.linalg.cho_solve(chol, b)

    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    # Cholesky: L lower-triangular, A = L L^T
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d

    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
