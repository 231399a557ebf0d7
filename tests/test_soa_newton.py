"""Parity: batch-last Newton constraints (physics/soa_newton.py) vs the
per-env engine's csolve path, per substep.

csolve.py is the calibrated oracle (itself tested against mujoco 3.10's
efc arrays in tests/test_csolve.py); this suite pins the SoA re-expression
to it so Newton-contact training runs ride the TPU fast path with the same
physics the engine path certifies.

Fixtures stay small (B=4-8, single substep) because the engine-side vmap of
the Newton solve is compile-heavy on the CPU test backend.
"""

import copy

import jax
import numpy as np
import pytest

from mjrl_tpu import envs
from mjrl_tpu.physics import soa
from mjrl_tpu.physics.engine import step as engine_step


def _warm_states(env, B, key, n_warm=3):
    keys = jax.random.split(key, B)
    st, _ = jax.vmap(env.reset)(keys)
    k = key
    for _ in range(n_warm):
        k, ka = jax.random.split(k)
        a = jax.random.uniform(
            ka, (B, env.spec.action_dim), minval=-1.0, maxval=1.0
        )
        st, *_ = jax.vmap(env.step)(st, a)
    return st


@pytest.mark.parametrize("name", ["hopper", "ant"])
def test_soa_newton_matches_engine_csolve(name):
    env = envs.make(name, horizon=32, constraint_solver="newton")
    model = env.model
    assert model.constraint_solver == "newton"
    assert soa.soa_supported(model), "newton models must ride the fast path"
    if name == "ant":
        # ant's 24-row/14-dof Newton program is compile-heavy on XLA:CPU;
        # 3 iterations exercise the identical code path (both sides obey
        # model.solver_iters) at a third of the lowering cost
        model.solver_iters = 3
    B = 4
    st = _warm_states(env, B, jax.random.PRNGKey(0))
    ctrl = jax.random.uniform(
        jax.random.PRNGKey(1), (B, env.spec.action_dim), minval=-1.0, maxval=1.0
    )
    dt = model.dt / model.n_substeps
    m1 = copy.copy(model)
    m1.n_substeps = 1
    m1.dt = dt
    ref = jax.jit(jax.vmap(lambda s, c: engine_step(m1, s, c)))(st, ctrl)
    got_q, got_qd = jax.jit(
        lambda q, qd, c: soa.substep(model, q, qd, c, dt)
    )(st.q.T, st.qd.T, ctrl.T)
    np.testing.assert_allclose(got_q.T, ref.q, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_qd.T, ref.qd, rtol=2e-3, atol=2e-3)


def test_newton_rows_only_activate_in_margin():
    """A hopper mid-air (no contact, inside limits) must reduce to the
    unconstrained solve: all D rows gate to zero."""
    env = envs.make("hopper", horizon=8, constraint_solver="newton")
    model = env.model
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    st, _ = jax.vmap(env.reset)(keys)
    # lift the torso well above the floor
    q = np.asarray(st.q)
    q[:, 1] += 2.0
    qT = jax.numpy.asarray(q.T)
    ctrl = jax.numpy.zeros((env.spec.action_dim, B))
    dt = model.dt / model.n_substeps

    m_pen = copy.copy(model)
    m_pen.constraint_solver = "penalty"
    got_q, got_qd = jax.jit(
        lambda q, qd, c: soa.substep(model, q, qd, c, dt)
    )(qT, st.qd.T, ctrl)
    ref_q, ref_qd = jax.jit(
        lambda q, qd, c: soa.substep(m_pen, q, qd, c, dt)
    )(qT, st.qd.T, ctrl)
    np.testing.assert_allclose(got_q, ref_q, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_qd, ref_qd, rtol=1e-4, atol=1e-5)
