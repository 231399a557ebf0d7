"""Collision detection + penalty contact forces, batched by collider kind.

Replaces the reference's reliance on MuJoCo's contact machinery (SURVEY.md
§2.2) with a TPU-friendly formulation: the candidate pair list is STATIC
(from the model's contype/conaffinity filtering), pairs are GROUPED BY
COLLIDER KIND at trace time (all capsule-vs-plane pairs evaluate as one
batched computation, etc.), and non-penetrating pairs contribute zero force
through ``where`` masks. The whole contact stage is ~a dozen fused
vector ops regardless of pair count — no per-pair Python dispatch in the
compiled program.

Force model (spring-damper normal + regularized Coulomb friction):

    f_n = max(0, k_n * min(depth, cap) - c_n * v_n)        (0 unless depth>0)
    f_t = -mu * f_n * v_t / (|v_t| + v_reg)

The depth cap bounds the spring force after deep penetration (reset noise /
landing impacts) so contacts cannot catapult light bodies; ``mu`` combines
pair friction by elementwise max (MuJoCo's rule). This penalty model differs
from MuJoCo's soft-constraint solver — a convex contact solve is the planned
upgrade (SURVEY.md §7.2 step 7) — but is stable at the models' native
timesteps under the implicit-damping integrator.

Supported collider pairs: sphere/capsule/box/cylinder(-as-capsule) vs plane,
sphere-sphere, sphere-capsule, capsule-capsule.

All returned wrenches are world-frame about ``kin.origin`` (engine
convention).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.physics import math3d as m3
from mjrl_tpu.physics.engine import Kinematics
from mjrl_tpu.physics.model import BOX, CAPSULE, CYLINDER, PLANE, SPHERE, Model


class _PairGroups(NamedTuple):
    """Static per-kind contact tables. Index arrays are numpy (trace-time
    constants); one row per CONTACT POINT (a capsule-plane pair contributes
    2 rows, a box-plane pair 8)."""

    kinds: Tuple[Tuple[str, Dict[str, np.ndarray]], ...]


def _pair_groups(model: Model) -> _PairGroups:
    cached = getattr(model, "_pair_groups", None)
    if cached is not None:
        return cached
    buckets: Dict[str, List[Dict]] = {}
    for gi, gj in model.contact_pairs:
        ti, tj = model.geom_type[gi], model.geom_type[gj]
        mu = max(float(model.geom_friction[gi]), float(model.geom_friction[gj]))
        row = dict(gi=gi, gj=gj, mu=mu,
                   li=model.geom_link[gi], lj=model.geom_link[gj])
        if tj == PLANE:
            if ti == SPHERE:
                buckets.setdefault("sphere_plane", []).append(row)
            elif ti in (CAPSULE, CYLINDER):
                buckets.setdefault("capsule_plane", []).append(row)
            elif ti == BOX:
                buckets.setdefault("box_plane", []).append(row)
        elif ti == SPHERE and tj == SPHERE:
            buckets.setdefault("sphere_sphere", []).append(row)
        elif ti == SPHERE and tj == CAPSULE:
            buckets.setdefault("sphere_capsule", []).append(row)
        elif ti == CAPSULE and tj == SPHERE:
            buckets.setdefault("sphere_capsule", []).append(
                dict(gi=gj, gj=gi, mu=mu, li=row["lj"], lj=row["li"])
            )
        elif ti in (CAPSULE, CYLINDER) and tj in (CAPSULE, CYLINDER):
            buckets.setdefault("capsule_capsule", []).append(row)
    kinds = []
    for kind, rows in buckets.items():
        tab = {
            "gi": np.asarray([r["gi"] for r in rows], np.int32),
            "gj": np.asarray([r["gj"] for r in rows], np.int32),
            "li": np.asarray([r["li"] for r in rows], np.int32),
            "lj": np.asarray([r["lj"] for r in rows], np.int32),
            "mu": np.asarray([r["mu"] for r in rows], np.float32),
        }
        kinds.append((kind, tab))
    groups = _PairGroups(kinds=tuple(kinds))
    model._pair_groups = groups
    return groups


def _geom_world_batch(model: Model, kin: Kinematics, g_idx: np.ndarray):
    """World poses of the selected geoms (world-static geoms use identity
    link pose via a padded dump row)."""
    nlink = model.nlink
    pos_all = jnp.concatenate([kin.pos, jnp.zeros((1, 3))], axis=0)
    quat_all = jnp.concatenate(
        [kin.quat, jnp.array([[1.0, 0, 0, 0]])], axis=0
    )
    links = np.asarray([model.geom_link[g] for g in g_idx], np.int32)
    links = np.where(links < 0, nlink, links)
    lp = pos_all[links]
    lq = quat_all[links]
    gp = jnp.asarray(model.geom_pos[g_idx])
    gq = jnp.asarray(model.geom_quat[g_idx])
    return lp + m3.quat_rotate(lq, gp), m3.quat_mul(lq, gq)


def _point_velocity(kin: Kinematics, links: np.ndarray, points: jax.Array):
    """World velocity of link-fixed material points (origin-relative
    ``points``); static links (-1) -> zero."""
    cvel = jnp.concatenate([kin.cvel, jnp.zeros((1, 6))], axis=0)
    links = np.where(links < 0, kin.cvel.shape[0], links)
    v = cvel[links]
    return v[:, 3:] + jnp.cross(v[:, :3], points)


def _penalty_forces(model, depth, n, points, v_rel, mu):
    """(P,) contacts -> (P, 3) world force on body i (reaction on j)."""
    v_n = jnp.sum(v_rel * n, axis=-1)
    v_t = v_rel - v_n[:, None] * n
    depth_eff = jnp.minimum(depth, model.contact_depth_cap)
    fn = jnp.maximum(
        0.0, model.contact_stiffness * depth_eff - model.contact_damping * v_n
    )
    fn = jnp.where(depth > 0.0, fn, 0.0)
    vt_norm = jnp.linalg.norm(v_t, axis=-1, keepdims=True)
    ft = -mu[:, None] * fn[:, None] * v_t / (vt_norm + model.friction_vel)
    return fn[:, None] * n + ft


def contact_forces(model: Model, kin: Kinematics) -> jax.Array:
    """(nlink, 6) world wrenches about ``kin.origin``."""
    groups = _pair_groups(model)
    f_ext = jnp.zeros((model.nlink + 1, 6))  # +1 dump row for static links
    for kind, tab in groups.kinds:
        depth, n, pts, li, lj, mu = _collide_kind(model, kin, kind, tab)
        pts_rel = pts - kin.origin
        v_rel = _point_velocity(kin, li, pts_rel) - _point_velocity(
            kin, lj, pts_rel
        )
        f = _penalty_forces(model, depth, n, pts_rel, v_rel, mu)
        wrench = jnp.concatenate([jnp.cross(pts_rel, f), f], axis=-1)
        li_ix = np.where(li < 0, model.nlink, li)
        lj_ix = np.where(lj < 0, model.nlink, lj)
        f_ext = f_ext.at[li_ix].add(wrench)
        f_ext = f_ext.at[lj_ix].add(-wrench)
    return f_ext[: model.nlink]


def _collide_kind(model: Model, kin: Kinematics, kind: str, tab):
    """Batched narrow-phase for one collider kind.

    Returns per-CONTACT arrays: depth (P,), normal (P,3) pointing j->i,
    world points (P,3), link indices (P,) for both sides, mu (P,)."""
    gi, gj, li, lj, mu = tab["gi"], tab["gj"], tab["li"], tab["lj"], tab["mu"]
    pi, qi = _geom_world_batch(model, kin, gi)
    pj, qj = _geom_world_batch(model, kin, gj)
    si = jnp.asarray(model.geom_size[gi])
    sj = jnp.asarray(model.geom_size[gj])

    if kind == "sphere_plane":
        nrm = m3.quat_rotate(qj, jnp.array([0.0, 0.0, 1.0]))
        dist = jnp.sum((pi - pj) * nrm, axis=-1) - si[:, 0]
        pts = pi - nrm * si[:, 0:1]
        return -dist, nrm, pts, li, lj, mu

    if kind == "capsule_plane":
        axis = m3.quat_rotate(qi, jnp.array([0.0, 0.0, 1.0]))
        ends = jnp.stack(
            [pi - si[:, 1:2] * axis, pi + si[:, 1:2] * axis], axis=1
        )  # (P, 2, 3)
        nrm = m3.quat_rotate(qj, jnp.array([0.0, 0.0, 1.0]))[:, None, :]
        dist = jnp.sum((ends - pj[:, None, :]) * nrm, axis=-1) - si[:, 0:1]
        pts = ends - nrm * si[:, 0:1, None]
        P = ends.shape[0]
        rep = lambda x: np.repeat(x, 2)
        return (
            (-dist).reshape(2 * P),
            jnp.broadcast_to(nrm, (P, 2, 3)).reshape(2 * P, 3),
            pts.reshape(2 * P, 3),
            rep(li),
            rep(lj),
            jnp.repeat(jnp.asarray(mu), 2),
        )

    if kind == "box_plane":
        corners = jnp.asarray(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            jnp.float32,
        )  # (8, 3)
        pts = pi[:, None, :] + m3.quat_rotate(
            qi[:, None, :], corners[None, :, :] * si[:, None, :3]
        )  # (P, 8, 3)
        nrm = m3.quat_rotate(qj, jnp.array([0.0, 0.0, 1.0]))[:, None, :]
        dist = jnp.sum((pts - pj[:, None, :]) * nrm, axis=-1)
        P = pts.shape[0]
        rep = lambda x: np.repeat(x, 8)
        return (
            (-dist).reshape(8 * P),
            jnp.broadcast_to(nrm, (P, 8, 3)).reshape(8 * P, 3),
            pts.reshape(8 * P, 3),
            rep(li),
            rep(lj),
            jnp.repeat(jnp.asarray(mu), 8),
        )

    if kind == "sphere_sphere":
        return _sphere_sphere(pi, si[:, 0], pj, sj[:, 0], li, lj, mu)

    if kind == "sphere_capsule":
        # gi is the sphere, gj the capsule
        axis = m3.quat_rotate(qj, jnp.array([0.0, 0.0, 1.0]))
        a = pj - sj[:, 1:2] * axis
        d = 2.0 * sj[:, 1:2] * axis
        t = jnp.clip(
            jnp.sum((pi - a) * d, axis=-1) / (jnp.sum(d * d, axis=-1) + 1e-12),
            0.0,
            1.0,
        )
        closest = a + t[:, None] * d
        return _sphere_sphere(pi, si[:, 0], closest, sj[:, 0], li, lj, mu)

    if kind == "capsule_capsule":
        ax_i = m3.quat_rotate(qi, jnp.array([0.0, 0.0, 1.0]))
        ax_j = m3.quat_rotate(qj, jnp.array([0.0, 0.0, 1.0]))
        p1 = pi - si[:, 1:2] * ax_i
        d1 = 2.0 * si[:, 1:2] * ax_i
        p2 = pj - sj[:, 1:2] * ax_j
        d2 = 2.0 * sj[:, 1:2] * ax_j
        r = p1 - p2
        a = jnp.sum(d1 * d1, -1) + 1e-12
        e = jnp.sum(d2 * d2, -1) + 1e-12
        b = jnp.sum(d1 * d2, -1)
        c = jnp.sum(d1 * r, -1)
        f = jnp.sum(d2 * r, -1)
        denom = a * e - b * b
        s = jnp.where(
            jnp.abs(denom) > 1e-9, (b * f - c * e) / (denom + 1e-12), 0.0
        )
        s = jnp.clip(s, 0.0, 1.0)
        t = jnp.clip((b * s + f) / e, 0.0, 1.0)
        s = jnp.clip((b * t - c) / a, 0.0, 1.0)
        c1 = p1 + s[:, None] * d1
        c2 = p2 + t[:, None] * d2
        return _sphere_sphere(c1, si[:, 0], c2, sj[:, 0], li, lj, mu)

    raise ValueError(kind)


def _sphere_sphere(c1, r1, c2, r2, li, lj, mu):
    d = c1 - c2
    dist = jnp.linalg.norm(d, axis=-1) + 1e-12
    nrm = d / dist[:, None]
    depth = (r1 + r2) - dist
    pts = c2 + nrm * (r2 - 0.5 * jnp.maximum(depth, 0.0))[:, None]
    return depth, nrm, pts, li, lj, mu
