"""3-D rotation + Featherstone spatial-vector algebra (pure JAX, f32).

Foundation of the first-party rigid-body engine that replaces the
reference's MuJoCo-via-mujoco_py dependency (SURVEY.md §2.2): quaternion
utilities and 6-D spatial motion/force vectors in Featherstone's Plücker
coordinates (RBDA conventions):

- a spatial MOTION vector is ``[angular(3); linear(3)]`` in a body frame;
- a coordinate transform from frame A to frame B, where B's origin sits at
  ``r`` (A coords) and ``E`` rotates A-vectors into B-vectors, acts as
  ``omega_B = E omega_A``, ``v_B = E (v_A - r x omega_A)``;
- FORCE vectors ``[torque(3); force(3)]`` transform with the dual map.

Everything is written as small fused elementwise/3x3 ops (VPU work) that
``vmap`` cleanly over env and body axes; no 6x6 matrices are materialized —
transforms stay factored as ``(E 3x3, r 3)`` pairs, which is both fewer
FLOPs and less HBM traffic than explicit Plücker matrices.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z), Hamilton convention, unit norm.
# ---------------------------------------------------------------------------


def quat_identity() -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.sqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True) + eps)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (active rotation, body->world if q is
    the body orientation)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """3x3 rotation matrix R with ``R @ v == quat_rotate(q, v)``."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def quat_integrate(q: jax.Array, omega: jax.Array, dt: float) -> jax.Array:
    """Integrate orientation by body-frame angular velocity (exponential map,
    the stable update MuJoCo-style semi-implicit Euler uses)."""
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    safe = jnp.where(angle < 1e-9, 1.0, angle)
    axis = omega / safe
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    dq = jnp.where(angle < 1e-9, quat_identity(), dq)
    return quat_normalize(quat_mul(q, dq))


def quat_from_zaxis_angle_deg(euler: jax.Array) -> jax.Array:
    """XYZ-extrinsic euler (degrees, MJCF default eulerseq) -> quaternion."""
    rad = euler * (jnp.pi / 180.0)
    qx = quat_from_axis_angle(jnp.array([1.0, 0, 0]), rad[..., 0])
    qy = quat_from_axis_angle(jnp.array([0, 1.0, 0]), rad[..., 1])
    qz = quat_from_axis_angle(jnp.array([0, 0, 1.0]), rad[..., 2])
    return quat_mul(qx, quat_mul(qy, qz))


def quat_to_euler(q: jax.Array) -> jax.Array:
    """Quaternion -> XYZ-extrinsic euler angles (gymnasium-robotics
    ``rotations.quat2euler`` convention, used by hammer observations)."""
    m = quat_to_mat(q)
    cy = jnp.sqrt(m[..., 2, 2] ** 2 + m[..., 1, 2] ** 2)
    eps = 1e-6
    safe = cy > eps
    x = jnp.where(
        safe,
        jnp.arctan2(-m[..., 1, 2], m[..., 2, 2]),
        jnp.arctan2(m[..., 1, 0], m[..., 1, 1]),
    )
    y = jnp.arctan2(m[..., 0, 2], cy)
    z = jnp.where(safe, jnp.arctan2(-m[..., 0, 1], m[..., 0, 0]), 0.0)
    return jnp.stack([x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# Spatial transforms, factored as (E: 3x3 rotation, r: 3 translation).
# x_B = E @ (x_A - r)
# ---------------------------------------------------------------------------


class SpatialTransform(NamedTuple):
    E: jax.Array  # (..., 3, 3)
    r: jax.Array  # (..., 3)


def xform_identity() -> SpatialTransform:
    return SpatialTransform(jnp.eye(3), jnp.zeros(3))


def xform_compose(x2: SpatialTransform, x1: SpatialTransform) -> SpatialTransform:
    """X2 * X1 (apply X1 first): A -> B via x1, B -> C via x2."""
    return SpatialTransform(
        E=x2.E @ x1.E,
        r=x1.r + jnp.einsum("...ij,...j->...i", _T(x1.E), x2.r),
    )


def xform_inv(x: SpatialTransform) -> SpatialTransform:
    return SpatialTransform(
        E=_T(x.E), r=-jnp.einsum("...ij,...j->...i", x.E, x.r)
    )


def _T(m: jax.Array) -> jax.Array:
    return jnp.swapaxes(m, -1, -2)


def xform_motion(x: SpatialTransform, v: jax.Array) -> jax.Array:
    """Motion vector A-coords -> B-coords: [E w; E (v - r x w)]."""
    w, lin = v[..., :3], v[..., 3:]
    wb = jnp.einsum("...ij,...j->...i", x.E, w)
    vb = jnp.einsum("...ij,...j->...i", x.E, lin - jnp.cross(x.r, w))
    return jnp.concatenate([wb, vb], axis=-1)


def xform_motion_inv(x: SpatialTransform, v: jax.Array) -> jax.Array:
    """Motion vector B-coords -> A-coords."""
    w, lin = v[..., :3], v[..., 3:]
    wa = jnp.einsum("...ji,...j->...i", x.E, w)
    va = jnp.einsum("...ji,...j->...i", x.E, lin) + jnp.cross(x.r, wa)
    return jnp.concatenate([wa, va], axis=-1)


def xform_force(x: SpatialTransform, f: jax.Array) -> jax.Array:
    """Force vector A-coords -> B-coords: [E (n - r x fl); E fl]."""
    n, fl = f[..., :3], f[..., 3:]
    nb = jnp.einsum("...ij,...j->...i", x.E, n - jnp.cross(x.r, fl))
    fb = jnp.einsum("...ij,...j->...i", x.E, fl)
    return jnp.concatenate([nb, fb], axis=-1)


def xform_force_inv(x: SpatialTransform, f: jax.Array) -> jax.Array:
    """Force vector B-coords -> A-coords (== X^T f, used in RNEA backward)."""
    n, fl = f[..., :3], f[..., 3:]
    fa = jnp.einsum("...ji,...j->...i", x.E, fl)
    na = jnp.einsum("...ji,...j->...i", x.E, n) + jnp.cross(x.r, fa)
    return jnp.concatenate([na, fa], axis=-1)


# ---------------------------------------------------------------------------
# Spatial cross products and inertia.
# ---------------------------------------------------------------------------


def crm(v: jax.Array, m: jax.Array) -> jax.Array:
    """Motion x motion: [w x w2; w x v2 + v x w2]."""
    w, lin = v[..., :3], v[..., 3:]
    w2, l2 = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, w2), jnp.cross(w, l2) + jnp.cross(lin, w2)], axis=-1
    )


def crf(v: jax.Array, f: jax.Array) -> jax.Array:
    """Motion x force: [w x n + v x fl; w x fl]."""
    w, lin = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(lin, fl), jnp.cross(w, fl)], axis=-1
    )


class SpatialInertia(NamedTuple):
    """Spatial inertia about the body-frame origin, factored as
    (mass, com offset c, 3x3 rotational inertia about the ORIGIN)."""

    mass: jax.Array  # (...,)
    com: jax.Array  # (..., 3)
    inertia: jax.Array  # (..., 3, 3)  about origin: I_C + m [c~][c~]^T


def make_inertia(mass, com, inertia_about_com) -> SpatialInertia:
    c = jnp.asarray(com)
    cx = skew(c)
    io = jnp.asarray(inertia_about_com) + jnp.asarray(mass) * cx @ _T(cx)
    return SpatialInertia(jnp.asarray(mass), c, io)


def skew(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))


def inertia_mul(I: SpatialInertia, v: jax.Array) -> jax.Array:
    """I @ v for spatial motion v -> spatial force."""
    w, lin = v[..., :3], v[..., 3:]
    n = jnp.einsum("...ij,...j->...i", I.inertia, w) + I.mass[..., None] * jnp.cross(
        I.com, lin
    )
    f = I.mass[..., None] * (lin - jnp.cross(I.com, w))
    return jnp.concatenate([n, f], axis=-1)


def inertia_to_matrix(I: SpatialInertia) -> jax.Array:
    """Dense 6x6 (for tests / CRBA congruence checks)."""
    m = I.mass[..., None, None]
    cx = skew(I.com)
    top = jnp.concatenate([I.inertia, m * cx], axis=-1)
    bot = jnp.concatenate([m * _T(cx), m * jnp.eye(3)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_transform(I: SpatialInertia, x: SpatialTransform) -> SpatialInertia:
    """Express an inertia given in B coords in A coords, where ``x`` maps
    A -> B (the CRBA composite propagation ``X^T I X``)."""
    # com in A coords
    com_a = jnp.einsum("...ji,...j->...i", x.E, I.com) + x.r
    # rotational inertia about B origin -> about com -> rotate -> about A origin
    cx_b = skew(I.com)
    i_com_b = I.inertia - I.mass[..., None, None] * cx_b @ _T(cx_b)
    i_com_a = jnp.einsum("...ji,...jk,...kl->...il", x.E, i_com_b, x.E)
    cx_a = skew(com_a)
    i_a = i_com_a + I.mass[..., None, None] * cx_a @ _T(cx_a)
    return SpatialInertia(I.mass, com_a, i_a)


def inertia_add(a: SpatialInertia, b: SpatialInertia) -> SpatialInertia:
    mass = a.mass + b.mass
    com = jnp.where(
        mass[..., None] > 0,
        (a.mass[..., None] * a.com + b.mass[..., None] * b.com)
        / jnp.maximum(mass[..., None], 1e-12),
        jnp.zeros_like(a.com),
    )
    return SpatialInertia(mass, com, a.inertia + b.inertia)
