"""CG and ridge-solve oracles (SURVEY.md §4a: CG vs np.linalg.solve)."""

import jax.numpy as jnp
import numpy as np

from mjrl_tpu.ops.cg import cg_solve
from mjrl_tpu.ops.lstsq import ridge_solve


def _spd(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    return (a @ a.T + n * np.eye(n)).astype(np.float32)


def test_cg_matches_direct_solve():
    n = 12
    a = _spd(n, 0)
    b = np.random.default_rng(1).normal(size=n).astype(np.float32)
    x = np.asarray(cg_solve(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), cg_iters=50))
    want = np.linalg.solve(a, b)
    np.testing.assert_allclose(x, want, rtol=1e-3, atol=1e-3)


def test_cg_respects_iteration_cap():
    n = 40
    a = _spd(n, 2)
    b = np.ones(n, np.float32)
    x10 = np.asarray(cg_solve(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), cg_iters=10))
    x50 = np.asarray(cg_solve(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), cg_iters=50))
    want = np.linalg.solve(a, b)
    # more iters → strictly better (or equal) residual
    assert np.linalg.norm(a @ x50 - b) <= np.linalg.norm(a @ x10 - b) + 1e-5
    np.testing.assert_allclose(x50, want, rtol=1e-3, atol=1e-3)


def test_ridge_solve_matches_numpy():
    rng = np.random.default_rng(3)
    m, k = 200, 7
    f = rng.normal(size=(m, k)).astype(np.float32)
    y = rng.normal(size=m).astype(np.float32)
    w = np.ones(m, np.float32)
    reg = 1e-3
    got = np.asarray(ridge_solve(jnp.asarray(f), jnp.asarray(y), jnp.asarray(w), reg))
    want = np.linalg.solve(f.T @ f + reg * np.eye(k), f.T @ y)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_ridge_solve_weights_mask_rows():
    rng = np.random.default_rng(4)
    m, k = 100, 5
    f = rng.normal(size=(m, k)).astype(np.float32)
    y = rng.normal(size=m).astype(np.float32)
    w = np.zeros(m, np.float32)
    w[:60] = 1.0
    got = np.asarray(ridge_solve(jnp.asarray(f), jnp.asarray(y), jnp.asarray(w), 1e-4))
    fw, yw = f[:60], y[:60]
    want = np.linalg.solve(fw.T @ fw + 1e-4 * np.eye(k), fw.T @ yw)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
