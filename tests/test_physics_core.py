"""Physics engine core tests: spatial algebra identities + analytic dynamics."""

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.physics import (
    HINGE,
    FREE,
    SLIDE,
    SPHERE,
    PLANE,
    Model,
    ModelBuilder,
    PhysicsState,
    forward_dynamics,
    forward_kinematics,
    joint_subspaces,
    step,
)
from mjrl_tpu.physics import math3d as m3


# ---------------------------------------------------------------------------
# math3d identities
# ---------------------------------------------------------------------------


def _rand_xform(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    q = m3.quat_normalize(jax.random.normal(k1, (4,)))
    r = jax.random.normal(k2, (3,))
    return m3.SpatialTransform(E=m3.quat_to_mat(q), r=r)


def test_quat_rotate_matches_matrix():
    q = m3.quat_normalize(jnp.array([0.9, 0.1, -0.3, 0.2]))
    v = jnp.array([1.0, -2.0, 0.5])
    np.testing.assert_allclose(
        np.asarray(m3.quat_rotate(q, v)),
        np.asarray(m3.quat_to_mat(q) @ v),
        rtol=1e-5, atol=1e-6,
    )


def test_quat_mul_matches_rotation_composition():
    q1 = m3.quat_normalize(jnp.array([0.7, 0.2, 0.1, -0.4]))
    q2 = m3.quat_normalize(jnp.array([0.2, -0.5, 0.8, 0.1]))
    v = jnp.array([0.3, 1.0, -0.7])
    np.testing.assert_allclose(
        np.asarray(m3.quat_rotate(m3.quat_mul(q1, q2), v)),
        np.asarray(m3.quat_rotate(q1, m3.quat_rotate(q2, v))),
        rtol=1e-5, atol=1e-6,
    )


def test_power_invariance_under_transform():
    """f . v is frame-invariant: (X* f) . (X v) == f . v."""
    x = _rand_xform(0)
    v = jax.random.normal(jax.random.PRNGKey(1), (6,))
    f = jax.random.normal(jax.random.PRNGKey(2), (6,))
    lhs = jnp.dot(m3.xform_force(x, f), m3.xform_motion(x, v))
    np.testing.assert_allclose(float(lhs), float(jnp.dot(f, v)), rtol=1e-4)


def test_xform_roundtrip():
    x = _rand_xform(3)
    v = jax.random.normal(jax.random.PRNGKey(4), (6,))
    np.testing.assert_allclose(
        np.asarray(m3.xform_motion_inv(x, m3.xform_motion(x, v))),
        np.asarray(v), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(m3.xform_force_inv(x, m3.xform_force(x, v))),
        np.asarray(v), rtol=1e-4, atol=1e-5,
    )


def test_inertia_mul_matches_dense():
    I = m3.make_inertia(2.5, jnp.array([0.1, -0.2, 0.3]), jnp.eye(3) * 0.4)
    v = jax.random.normal(jax.random.PRNGKey(5), (6,))
    np.testing.assert_allclose(
        np.asarray(m3.inertia_mul(I, v)),
        np.asarray(m3.inertia_to_matrix(I) @ v),
        rtol=1e-4, atol=1e-5,
    )


def test_inertia_transform_congruence():
    """inertia_transform == X^T I X on dense 6x6 matrices."""
    I = m3.make_inertia(1.7, jnp.array([0.2, 0.1, -0.1]), jnp.eye(3) * 0.3)
    x = _rand_xform(6)
    got = m3.inertia_to_matrix(m3.inertia_transform(I, x))
    # dense: I_A = X_m^T I_B X_m where X_m maps motion A->B
    v_basis = jnp.eye(6)
    Xm = jnp.stack([m3.xform_motion(x, v_basis[i]) for i in range(6)], axis=1)
    want = Xm.T @ m3.inertia_to_matrix(I) @ Xm
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# analytic dynamics
# ---------------------------------------------------------------------------


def _pendulum(l=1.0, mass=1.0):
    b = ModelBuilder(dt=0.001)
    b.add_body(
        "bob",
        joints=[dict(type=HINGE, axis=(0, 1, 0))],
        mass=mass,
        com=(0, 0, -l),
        inertia_com=np.zeros((3, 3)),
    )
    return b.finalize(contact_pairs="none")


def test_pendulum_acceleration_analytic():
    l, g = 1.0, 9.81
    model = _pendulum(l=l)
    for theta in [0.0, 0.3, 1.0, -2.0]:
        state = PhysicsState(q=jnp.array([theta]), qd=jnp.zeros(1))
        qdd = forward_dynamics(model, state, jnp.zeros(0))
        want = -(g / l) * np.sin(theta)
        np.testing.assert_allclose(float(qdd[0]), want, rtol=1e-4, atol=1e-5)


def test_pendulum_energy_conservation():
    l, g, m = 1.0, 9.81, 1.0
    model = _pendulum(l=l, mass=m)
    state = PhysicsState(q=jnp.array([2.0]), qd=jnp.zeros(1))

    def energy(s):
        h = -l * np.cos(float(s.q[0]))
        return 0.5 * m * l**2 * float(s.qd[0]) ** 2 + m * g * h

    e0 = energy(state)
    f = jax.jit(lambda s: step(model, s, jnp.zeros(0)))
    for _ in range(2000):  # 2 seconds at dt=1ms
        state = f(state)
    assert abs(energy(state) - e0) < 0.02 * abs(e0) + 0.02


def test_double_pendulum_matches_lagrangian():
    """Two-link pendulum qdd vs the textbook Lagrangian equations."""
    l1 = l2 = 1.0
    m1 = m2 = 1.0
    g = 9.81
    b = ModelBuilder(dt=0.001)
    b.add_body(
        "l1",
        joints=[dict(type=HINGE, axis=(0, 1, 0))],
        mass=m1, com=(0, 0, -l1), inertia_com=np.zeros((3, 3)),
    )
    b.add_body(
        "l2", parent="l1", pos=(0, 0, -l1),
        joints=[dict(type=HINGE, axis=(0, 1, 0))],
        mass=m2, com=(0, 0, -l2), inertia_com=np.zeros((3, 3)),
    )
    model = b.finalize(contact_pairs="none")

    th1, th2 = 0.4, -0.7
    w1, w2 = 0.3, -0.2
    state = PhysicsState(q=jnp.array([th1, th2]), qd=jnp.array([w1, w2]))
    qdd = np.asarray(forward_dynamics(model, state, jnp.zeros(0)))

    # Textbook double pendulum (relative angle th2), planar:
    M11 = (m1 + m2) * l1**2 + m2 * l2**2 + 2 * m2 * l1 * l2 * np.cos(th2)
    M12 = m2 * l2**2 + m2 * l1 * l2 * np.cos(th2)
    M22 = m2 * l2**2
    h = -m2 * l1 * l2 * np.sin(th2)
    C1 = h * (2 * w1 * w2 + w2**2)
    C2 = -h * w1**2
    G1 = (m1 + m2) * g * l1 * np.sin(th1) + m2 * g * l2 * np.sin(th1 + th2)
    G2 = m2 * g * l2 * np.sin(th1 + th2)
    M = np.array([[M11, M12], [M12, M22]])
    rhs = -np.array([C1 + G1, C2 + G2])
    want = np.linalg.solve(M, rhs)
    np.testing.assert_allclose(qdd, want, rtol=1e-3, atol=1e-4)


def test_free_body_projectile():
    b = ModelBuilder(dt=0.01)
    b.add_body(
        "ball",
        joints=[dict(type=FREE)],
        mass=1.0, com=(0, 0, 0), inertia_com=np.eye(3) * 0.01,
    )
    model = b.finalize(contact_pairs="none")
    q0 = model.default_qpos.copy()
    q0[2] = 10.0
    qd0 = np.zeros(6, np.float32)
    qd0[3] = 2.0  # v_x (body == world at identity quat)
    state = PhysicsState(q=jnp.asarray(q0), qd=jnp.asarray(qd0))
    f = jax.jit(lambda s: step(model, s, jnp.zeros(0)))
    for _ in range(100):  # 1 second
        state = f(state)
    # semi-implicit Euler: z = z0 - g*dt^2*sum(k) = z0 - g*(T(T+dt))/2
    t = 1.0
    z_want = 10.0 - 0.5 * 9.81 * t * (t + model.dt)
    np.testing.assert_allclose(float(state.q[2]), z_want, rtol=1e-3)
    np.testing.assert_allclose(float(state.q[0]), 2.0 * t, rtol=1e-3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.q[3:7])), 1.0, rtol=1e-5
    )


def test_slide_gravity():
    """A vertical slider in gravity accelerates at -g."""
    b = ModelBuilder(dt=0.001)
    b.add_body(
        "s", joints=[dict(type=SLIDE, axis=(0, 0, 1))],
        mass=2.0, com=(0, 0, 0), inertia_com=np.zeros((3, 3)),
    )
    model = b.finalize(contact_pairs="none")
    state = PhysicsState(q=jnp.zeros(1), qd=jnp.zeros(1))
    qdd = forward_dynamics(model, state, jnp.zeros(0))
    np.testing.assert_allclose(float(qdd[0]), -9.81, rtol=1e-5)


def test_mass_matrix_symmetric_pd():
    b = ModelBuilder()
    b.add_body(
        "root",
        joints=[
            dict(type=SLIDE, axis=(1, 0, 0)),
            dict(type=SLIDE, axis=(0, 0, 1)),
            dict(type=HINGE, axis=(0, 1, 0)),
        ],
        mass=3.0, com=(0.1, 0, 0.05), inertia_com=np.eye(3) * 0.2,
    )
    b.add_body(
        "leg", parent="root", pos=(0, 0, -0.3),
        joints=[dict(type=HINGE, axis=(0, 1, 0), armature=0.1)],
        mass=1.0, com=(0, 0, -0.2), inertia_com=np.eye(3) * 0.05,
    )
    model = b.finalize(contact_pairs="none")
    from mjrl_tpu.physics.engine import compute_kinematics, crba

    subs = joint_subspaces(model)
    q = jnp.array([0.3, -0.1, 0.5, -0.8])
    kin = compute_kinematics(model, PhysicsState(q=q, qd=jnp.zeros(4)), subs)
    M = np.asarray(crba(model, kin, subs))
    np.testing.assert_allclose(M, M.T, rtol=1e-4, atol=1e-6)
    assert np.linalg.eigvalsh(M).min() > 0


def test_sphere_settles_on_plane():
    b = ModelBuilder(dt=0.002)
    b.add_geom(None, PLANE, size=(0, 0, 0))
    b.add_body(
        "ball", joints=[dict(type=FREE)],
        mass=1.0, com=(0, 0, 0), inertia_com=np.eye(3) * 0.004,
    )
    b.add_geom("ball", SPHERE, size=(0.1, 0, 0))
    model = b.finalize(contact_pairs="ground")
    q0 = model.default_qpos.copy()
    q0[2] = 0.3
    state = PhysicsState(q=jnp.asarray(q0), qd=jnp.zeros(6))
    f = jax.jit(lambda s: step(model, s, jnp.zeros(0)))
    for _ in range(1500):  # 3 seconds
        state = f(state)
    z = float(state.q[2])
    # rests near the surface: z ~ radius - mg/k penetration
    pen = 9.81 / model.contact_stiffness
    np.testing.assert_allclose(z, 0.1 - pen, atol=5e-3)
    # no lateral drift, negligible residual velocity
    assert abs(float(state.q[0])) < 1e-3 and abs(float(state.q[1])) < 1e-3
    assert np.abs(np.asarray(state.qd)).max() < 0.05


def test_step_vmaps_and_jits():
    model = _pendulum()
    states = PhysicsState(
        q=jnp.linspace(-1, 1, 32)[:, None], qd=jnp.zeros((32, 1))
    )
    f = jax.jit(jax.vmap(lambda s: step(model, s, jnp.zeros(0))))
    out = f(states)
    assert out.q.shape == (32, 1)
    assert bool(jnp.all(jnp.isfinite(out.q)))
