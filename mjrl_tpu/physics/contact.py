"""Collision detection + penalty contact forces.

Replaces the reference's reliance on MuJoCo's contact machinery (SURVEY.md
§2.2) with a TPU-friendly formulation: the candidate pair list is STATIC
(computed once from the model — every movable geom vs planes, optionally vs
other movable geoms), every pair is evaluated unconditionally each step, and
non-penetrating pairs contribute zero force through ``where`` masks. No
dynamic shapes, no host branching — the whole contact stage fuses into the
step program.

Force model (spring-damper normal + regularized Coulomb friction, the
standard smooth-penalty formulation used by brax's spring/positional
pipelines for these same gym tasks):

    f_n = max(0, k_n * depth - c_n * v_n)
    f_t = -mu * f_n * v_t / (|v_t| + v_reg)

This differs from MuJoCo's soft-constraint solver (solref/solimp) — a
convex-solver contact stage is the planned upgrade (SURVEY.md §7.2 step 7's
"proper impulse/PGS-style solve"); the penalty model is stable at the
models' native timesteps under the implicit-damping integrator and suffices
for the hopper/walker/cheetah/ant capability ladder.

Supported collider pairs: sphere/capsule/box vs plane, sphere-sphere,
sphere-capsule, capsule-capsule.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from mjrl_tpu.physics import math3d as m3
from mjrl_tpu.physics.engine import Kinematics
from mjrl_tpu.physics.model import BOX, CAPSULE, CYLINDER, PLANE, SPHERE, Model

Contact = Tuple[jax.Array, jax.Array, jax.Array]  # depth, normal (j->i), point


def _geom_world(model: Model, kin: Kinematics, g: int):
    link = model.geom_link[g]
    gp = jnp.asarray(model.geom_pos[g])
    gq = jnp.asarray(model.geom_quat[g])
    if link < 0:
        return gp, gq
    return (
        kin.pos[link] + m3.quat_rotate(kin.quat[link], gp),
        m3.quat_mul(kin.quat[link], gq),
    )


def _capsule_segment(pos, quat, half_len):
    axis = m3.quat_rotate(quat, jnp.array([0.0, 0.0, 1.0]))
    return pos - half_len * axis, pos + half_len * axis


def _plane_normal(quat):
    return m3.quat_rotate(quat, jnp.array([0.0, 0.0, 1.0]))


def _sphere_plane(c, r, p0, n) -> List[Contact]:
    dist = jnp.dot(c - p0, n) - r
    return [(-dist, n, c - n * r)]


def _capsule_plane(pos, quat, size, p0, n) -> List[Contact]:
    r, hl = size[0], size[1]
    a, b = _capsule_segment(pos, quat, hl)
    return _sphere_plane(a, r, p0, n) + _sphere_plane(b, r, p0, n)


def _box_plane(pos, quat, size, p0, n) -> List[Contact]:
    out: List[Contact] = []
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                corner = pos + m3.quat_rotate(
                    quat, jnp.array([sx, sy, sz]) * size[:3]
                )
                dist = jnp.dot(corner - p0, n)
                out.append((-dist, n, corner))
    return out


def _sphere_sphere(c1, r1, c2, r2) -> List[Contact]:
    d = c1 - c2
    dist = jnp.linalg.norm(d) + 1e-12
    n = d / dist
    depth = (r1 + r2) - dist
    point = c2 + n * (r2 - 0.5 * jnp.maximum(depth, 0.0))
    return [(depth, n, point)]


def _segment_closest(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2] (clamped)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1) + 1e-12
    e = jnp.dot(d2, d2) + 1e-12
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-9, (b * f - c * e) / (denom + 1e-12), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = (b * s + f) / e
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / a, 0.0, 1.0)
    return p1 + s * d1, p2 + t_cl * d2


def _collide(model: Model, kin: Kinematics, gi: int, gj: int) -> List[Contact]:
    ti, tj = model.geom_type[gi], model.geom_type[gj]
    pi, qi = _geom_world(model, kin, gi)
    pj, qj = _geom_world(model, kin, gj)
    si = jnp.asarray(model.geom_size[gi])
    sj = jnp.asarray(model.geom_size[gj])
    if tj == PLANE:
        n = _plane_normal(qj)
        if ti == SPHERE:
            return _sphere_plane(pi, si[0], pj, n)
        if ti == CAPSULE:
            return _capsule_plane(pi, qi, si, pj, n)
        if ti == BOX:
            return _box_plane(pi, qi, si, pj, n)
        if ti == CYLINDER:  # approximate with its bounding capsule
            return _capsule_plane(pi, qi, si, pj, n)
        return []
    if ti == SPHERE and tj == SPHERE:
        return _sphere_sphere(pi, si[0], pj, sj[0])
    if ti == SPHERE and tj == CAPSULE:
        a, b = _capsule_segment(pj, qj, sj[1])
        cp, cq = _segment_closest(pi, pi, a, b)
        return _sphere_sphere(pi, si[0], cq, sj[0])
    if ti == CAPSULE and tj == SPHERE:
        a, b = _capsule_segment(pi, qi, si[1])
        cp, _ = _segment_closest(a, b, pj, pj)
        return _sphere_sphere(cp, si[0], pj, sj[0])
    if ti == CAPSULE and tj == CAPSULE:
        a1, b1 = _capsule_segment(pi, qi, si[1])
        a2, b2 = _capsule_segment(pj, qj, sj[1])
        c1, c2 = _segment_closest(a1, b1, a2, b2)
        return _sphere_sphere(c1, si[0], c2, sj[0])
    return []


def _point_velocity(kin: Kinematics, link: int, point: jax.Array) -> jax.Array:
    """World-frame velocity of a link-fixed material point at world ``point``."""
    if link < 0:
        return jnp.zeros(3)
    R = m3.quat_to_mat(kin.quat[link])
    omega_w = R @ kin.v[link][:3]
    v_origin_w = R @ kin.v[link][3:]
    return v_origin_w + jnp.cross(omega_w, point - kin.pos[link])


def contact_forces(model: Model, kin: Kinematics) -> jax.Array:
    """(nlink, 6) world-frame spatial forces about the WORLD origin."""
    f_ext = jnp.zeros((model.nlink, 6))
    for gi, gj in model.contact_pairs:
        li, lj = model.geom_link[gi], model.geom_link[gj]
        # MuJoCo combines pair friction by elementwise max
        mu = max(float(model.geom_friction[gi]), float(model.geom_friction[gj]))
        for depth, n, point in _collide(model, kin, gi, gj):
            v_rel = _point_velocity(kin, li, point) - _point_velocity(
                kin, lj, point
            )
            v_n = jnp.dot(v_rel, n)
            v_t = v_rel - v_n * n
            # depth cap bounds the spring force after deep penetration
            # (reset noise / landing impacts) so contacts can't catapult
            # light bodies — the damping term still absorbs approach speed
            depth_eff = jnp.minimum(depth, model.contact_depth_cap)
            fn = jnp.maximum(
                0.0,
                model.contact_stiffness * depth_eff
                - model.contact_damping * v_n,
            )
            fn = jnp.where(depth > 0.0, fn, 0.0)
            ft = -mu * fn * v_t / (jnp.linalg.norm(v_t) + model.friction_vel)
            f = fn * n + ft
            wrench = jnp.concatenate([jnp.cross(point, f), f])
            if li >= 0:
                f_ext = f_ext.at[li].add(wrench)
            if lj >= 0:
                f_ext = f_ext.at[lj].add(-wrench)
    return f_ext
