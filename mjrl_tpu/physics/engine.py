"""The rigid-body pipeline: kinematics -> CRBA/RNEA -> integrate.

First-party MJX-style dynamics replacing the reference's `env.step ->
mujoco_py sim.step()` C boundary (SURVEY.md §3.1 HOT LOOP #1): one pure
function ``step(model, state, ctrl)`` advances a single env; callers ``vmap``
it over thousands of env instances and ``lax.scan`` it over time, so the
whole rollout compiles into one XLA program on the TPU.

Algorithms (Featherstone, RBDA):
- forward kinematics over the expanded link tree (Python loop over <=~30
  links, unrolled at trace time; all math batched over envs by vmap),
- CRBA for the joint-space mass matrix M(q) (+ armature on the diagonal),
- RNEA with zero acceleration for the bias forces C(q, qd) (gravity enters
  through the world base acceleration trick), with world-frame external
  (contact) forces folded into the backward pass,
- forward dynamics by batched Cholesky solve of ``(M + dt*D) qdd = tau -
  C - D qd`` — the same implicit-joint-damping Euler MuJoCo's default
  integrator uses, which keeps the high-damping Adroit/locomotion models
  stable at f32,
- semi-implicit Euler position update with quaternion exponential-map
  integration for ball/free joints.

The per-env mass matrix is small (nv <= ~25); its Cholesky batches over the
env axis, which is exactly the batched-small-matrix pattern the Pallas
optimization pass targets later (SURVEY.md §7.2 step 9).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.physics import math3d as m3
from mjrl_tpu.physics.model import BALL, FREE, HINGE, SLIDE, Model


class PhysicsState(NamedTuple):
    q: jax.Array  # (nq,)
    qd: jax.Array  # (nv,)


class Kinematics(NamedTuple):
    """World poses + link-frame spatial quantities, one env."""

    pos: jax.Array  # (nlink, 3) world position of link frames
    quat: jax.Array  # (nlink, 4) world orientation
    x_up: Tuple[m3.SpatialTransform, ...]  # parent->child motion transforms
    v: jax.Array  # (nlink, 6) link spatial velocity, child coords


def _joint_subspace(model: Model, i: int) -> Optional[np.ndarray]:
    """Static (6, d) motion subspace S for link i's joint, child coords."""
    t = model.link_jnt_type[i]
    if t == -1:
        return None
    anchor = model.jnt_anchor[i]
    if t == HINGE:
        a = model.jnt_axis[i]
        return np.concatenate([a, np.cross(anchor, a)]).reshape(6, 1)
    if t == SLIDE:
        a = model.jnt_axis[i]
        return np.concatenate([np.zeros(3), a]).reshape(6, 1)
    if t == BALL:
        s = np.zeros((6, 3), np.float32)
        s[:3] = np.eye(3)
        s[3:] = _skew_np(anchor)
        return s
    if t == FREE:
        return np.eye(6, dtype=np.float32)
    raise ValueError(t)


def _skew_np(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float32
    )


def joint_subspaces(model: Model) -> List[Optional[np.ndarray]]:
    return [_joint_subspace(model, i) for i in range(model.nlink)]


def _joint_pose(model: Model, i: int, q: jax.Array):
    """Local pose (pos, quat) contributed by link i's joint at config q."""
    t = model.link_jnt_type[i]
    adr = model.link_qadr[i]
    anchor = jnp.asarray(model.jnt_anchor[i])
    if t == -1:
        return jnp.zeros(3), m3.quat_identity()
    if t == HINGE:
        # MuJoCo ref semantics: the joint displacement is (q - ref).
        quat = m3.quat_from_axis_angle(
            jnp.asarray(model.jnt_axis[i]), q[adr] - model.jnt_ref[i]
        )
        pos = anchor - m3.quat_rotate(quat, anchor)
        return pos, quat
    if t == SLIDE:
        return (
            jnp.asarray(model.jnt_axis[i]) * (q[adr] - model.jnt_ref[i]),
            m3.quat_identity(),
        )
    if t == BALL:
        quat = m3.quat_normalize(jax.lax.dynamic_slice(q, (adr,), (4,)))
        pos = anchor - m3.quat_rotate(quat, anchor)
        return pos, quat
    if t == FREE:
        pos = jax.lax.dynamic_slice(q, (adr,), (3,))
        quat = m3.quat_normalize(jax.lax.dynamic_slice(q, (adr + 3,), (4,)))
        return pos, quat
    raise ValueError(t)


def forward_kinematics(model: Model, q: jax.Array):
    """World poses of all link frames. Returns (pos (nlink,3), quat (nlink,4),
    rel (list of per-link (pos, quat) relative to parent))."""
    pos_list, quat_list, rel = [], [], []
    for i in range(model.nlink):
        jp, jq = _joint_pose(model, i, q)
        # local = fixed offset ∘ joint
        off_p = jnp.asarray(model.link_pos[i])
        off_q = jnp.asarray(model.link_quat[i])
        rel_p = off_p + m3.quat_rotate(off_q, jp)
        rel_q = m3.quat_mul(off_q, jq)
        p = model.link_parent[i]
        if p < 0:
            w_p, w_q = rel_p, rel_q
        else:
            w_p = pos_list[p] + m3.quat_rotate(quat_list[p], rel_p)
            w_q = m3.quat_mul(quat_list[p], rel_q)
        pos_list.append(w_p)
        quat_list.append(w_q)
        rel.append((rel_p, rel_q))
    return jnp.stack(pos_list), jnp.stack(quat_list), rel


def compute_kinematics(
    model: Model, state: PhysicsState, subspaces
) -> Kinematics:
    pos, quat, rel = forward_kinematics(model, state.q)
    x_up: List[m3.SpatialTransform] = []
    v_list: List[jax.Array] = []
    for i in range(model.nlink):
        rel_p, rel_q = rel[i]
        x = m3.SpatialTransform(E=jnp.swapaxes(m3.quat_to_mat(rel_q), -1, -2), r=rel_p)
        x_up.append(x)
        p = model.link_parent[i]
        v_parent = v_list[p] if p >= 0 else jnp.zeros(6)
        v = m3.xform_motion(x, v_parent)
        S = subspaces[i]
        if S is not None:
            d = S.shape[1]
            qd_i = jax.lax.dynamic_slice(state.qd, (model.link_vadr[i],), (d,))
            v = v + jnp.asarray(S) @ qd_i
        v_list.append(v)
    return Kinematics(pos=pos, quat=quat, x_up=tuple(x_up), v=jnp.stack(v_list))


def crba(model: Model, kin: Kinematics, subspaces) -> jax.Array:
    """Joint-space mass matrix (nv, nv) via composite rigid bodies."""
    nv = model.nv
    Ic: List[m3.SpatialInertia] = [
        m3.make_inertia(
            jnp.asarray(model.link_mass[i]),
            jnp.asarray(model.link_com[i]),
            jnp.asarray(model.link_inertia_com[i]),
        )
        for i in range(model.nlink)
    ]
    for i in range(model.nlink - 1, -1, -1):
        p = model.link_parent[i]
        if p >= 0:
            Ic[p] = m3.inertia_add(
                Ic[p], m3.inertia_transform(Ic[i], kin.x_up[i])
            )
    M = jnp.zeros((nv, nv))
    for i in range(model.nlink):
        S_i = subspaces[i]
        if S_i is None:
            continue
        d_i = S_i.shape[1]
        vi = model.link_vadr[i]
        # F = Ic[i] @ S_i, column-wise (6, d)
        F = jnp.stack(
            [m3.inertia_mul(Ic[i], jnp.asarray(S_i)[:, k]) for k in range(d_i)],
            axis=1,
        )
        M = M.at[vi : vi + d_i, vi : vi + d_i].set(jnp.asarray(S_i).T @ F)
        j = i
        while model.link_parent[j] >= 0:
            # climb: express F in the parent's coordinates
            F = jnp.stack(
                [
                    m3.xform_force_inv(kin.x_up[j], F[:, k])
                    for k in range(d_i)
                ],
                axis=1,
            )
            j = model.link_parent[j]
            S_j = subspaces[j]
            if S_j is None:
                continue
            d_j = S_j.shape[1]
            vj = model.link_vadr[j]
            blk = F.T @ jnp.asarray(S_j)  # (d_i, d_j)
            M = M.at[vi : vi + d_i, vj : vj + d_j].set(blk)
            M = M.at[vj : vj + d_j, vi : vi + d_i].set(blk.T)
    return M


def rnea_bias(
    model: Model,
    kin: Kinematics,
    subspaces,
    f_ext_world: Optional[jax.Array] = None,
) -> jax.Array:
    """C(q, qd) including gravity; minus external world forces.

    ``f_ext_world``: (nlink, 6) spatial forces in world coords about the
    WORLD origin ([p x f + torque; f] accumulated by the contact module).
    Returns (nv,) generalized bias such that M qdd + bias = tau.
    """
    a0 = jnp.concatenate([jnp.zeros(3), -jnp.asarray(model.gravity)])
    a_list: List[jax.Array] = []
    f_list: List[jax.Array] = []
    I_list = [
        m3.make_inertia(
            jnp.asarray(model.link_mass[i]),
            jnp.asarray(model.link_com[i]),
            jnp.asarray(model.link_inertia_com[i]),
        )
        for i in range(model.nlink)
    ]
    v_parent_cache: List[jax.Array] = []
    for i in range(model.nlink):
        p = model.link_parent[i]
        v_parent = v_parent_cache[p] if p >= 0 else jnp.zeros(6)
        vJ = kin.v[i] - m3.xform_motion(kin.x_up[i], v_parent)
        a_parent = a_list[p] if p >= 0 else a0
        a = m3.xform_motion(kin.x_up[i], a_parent) + m3.crm(kin.v[i], vJ)
        f = m3.inertia_mul(I_list[i], a) + m3.crf(
            kin.v[i], m3.inertia_mul(I_list[i], kin.v[i])
        )
        if f_ext_world is not None:
            x_wi = m3.SpatialTransform(
                E=jnp.swapaxes(m3.quat_to_mat(kin.quat[i]), -1, -2), r=kin.pos[i]
            )
            f = f - m3.xform_force(x_wi, f_ext_world[i])
        a_list.append(a)
        f_list.append(f)
        v_parent_cache.append(kin.v[i])
    C = jnp.zeros(model.nv)
    for i in range(model.nlink - 1, -1, -1):
        S = subspaces[i]
        if S is not None:
            d = S.shape[1]
            vi = model.link_vadr[i]
            C = C.at[vi : vi + d].set(jnp.asarray(S).T @ f_list[i])
        p = model.link_parent[i]
        if p >= 0:
            f_list[p] = f_list[p] + m3.xform_force_inv(kin.x_up[i], f_list[i])
    return C


def passive_forces(model: Model, state: PhysicsState) -> jax.Array:
    """Joint springs + limit penalties (damping handled implicitly in the
    integrator). Returns (nv,) generalized force."""
    tau = jnp.zeros(model.nv)
    for i in range(model.nlink):
        t = model.link_jnt_type[i]
        if t not in (HINGE, SLIDE):
            continue
        adr, vadr = model.link_qadr[i], model.link_vadr[i]
        qi, qdi = state.q[adr], state.qd[vadr]
        f = -model.jnt_stiffness[i] * (qi - model.jnt_springref[i])
        if model.jnt_limited[i] > 0:
            lo, hi = model.jnt_range[i]
            below = jnp.minimum(qi - lo, 0.0)
            above = jnp.maximum(qi - hi, 0.0)
            viol = below + above
            f = f - model.limit_stiffness * viol
            active = jnp.abs(viol) > 0
            f = f - jnp.where(active, model.limit_damping * qdi, 0.0)
        tau = tau.at[vadr].add(f)
    return tau


def actuation(model: Model, ctrl: jax.Array) -> jax.Array:
    """Torque motors: tau[dof] += gear * clip(ctrl)."""
    tau = jnp.zeros(model.nv)
    if model.nu == 0:
        return tau
    lo = jnp.asarray(model.act_ctrlrange[:, 0])
    hi = jnp.asarray(model.act_ctrlrange[:, 1])
    limited = jnp.asarray(model.act_ctrllimited) > 0
    c = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)
    return tau.at[jnp.asarray(model.act_vadr)].add(jnp.asarray(model.act_gear) * c)


def fluid_forces(model: Model, kin: Kinematics) -> jax.Array:
    """MuJoCo's legacy inertia-box fluid model (medium density/viscosity).

    Per body, in its principal-inertia frame with equivalent box half-sizes
    ``b`` (precomputed in the model), com velocity ``v`` and angular velocity
    ``w`` (formulas verified numerically against MuJoCo 3.x qfrc_passive):

        F_i   = -3 pi (2 mean(b)) mu v_i  -  2 rho b_j b_k |v_i| v_i
        tau_i = -pi (2 mean(b))^3 mu w_i  -  0.5 rho b_i (b_j^4+b_k^4)|w_i| w_i

    Returns (nlink, 6) world wrenches about the world origin. This is what
    makes the gym swimmer swim (its MJCF sets density=4000, viscosity=0.1).
    """
    f_ext = jnp.zeros((model.nlink, 6))
    rho, mu = model.density, model.viscosity
    if rho == 0.0 and mu == 0.0:
        return f_ext
    for i in range(model.nlink):
        if model.link_mass[i] <= 0:
            continue
        R_wl = m3.quat_to_mat(kin.quat[i])
        R_lp = m3.quat_to_mat(jnp.asarray(model.link_iquat[i]))
        R_wp = R_wl @ R_lp
        com_w = kin.pos[i] + R_wl @ jnp.asarray(model.link_com[i])
        omega_w = R_wl @ kin.v[i][:3]
        v_com_w = R_wl @ kin.v[i][3:] + jnp.cross(omega_w, com_w - kin.pos[i])
        w_p = R_wp.T @ omega_w
        v_p = R_wp.T @ v_com_w
        b = jnp.asarray(model.link_ibox[i])
        b_j = b[jnp.array([1, 2, 0])]
        b_k = b[jnp.array([2, 0, 1])]
        d_eq = 2.0 * jnp.mean(b)
        force = -3.0 * jnp.pi * d_eq * mu * v_p - 2.0 * rho * b_j * b_k * jnp.abs(
            v_p
        ) * v_p
        torque = -jnp.pi * d_eq**3 * mu * w_p - 0.5 * rho * b * (
            b_j**4 + b_k**4
        ) * jnp.abs(w_p) * w_p
        f_w = R_wp @ force
        t_w = R_wp @ torque
        wrench = jnp.concatenate([jnp.cross(com_w, f_w) + t_w, f_w])
        f_ext = f_ext.at[i].add(wrench)
    return f_ext


def integrate(
    model: Model, state: PhysicsState, qdd: jax.Array, dt: Optional[float] = None
) -> PhysicsState:
    """Semi-implicit Euler with quaternion exponential-map updates."""
    dt = model.dt if dt is None else dt
    qd = state.qd + dt * qdd
    q = state.q
    for i in range(model.nlink):
        t = model.link_jnt_type[i]
        adr, vadr = model.link_qadr[i], model.link_vadr[i]
        if t in (HINGE, SLIDE):
            q = q.at[adr].add(dt * qd[vadr])
        elif t == BALL:
            quat = jax.lax.dynamic_slice(q, (adr,), (4,))
            omega = jax.lax.dynamic_slice(qd, (vadr,), (3,))
            q = jax.lax.dynamic_update_slice(
                q, m3.quat_integrate(quat, omega, dt), (adr,)
            )
        elif t == FREE:
            pos = jax.lax.dynamic_slice(q, (adr,), (3,))
            quat = jax.lax.dynamic_slice(q, (adr + 3,), (4,))
            omega = jax.lax.dynamic_slice(qd, (vadr,), (3,))
            vlin = jax.lax.dynamic_slice(qd, (vadr + 3,), (3,))
            pos = pos + dt * m3.quat_rotate(quat, vlin)
            quat = m3.quat_integrate(quat, omega, dt)
            q = jax.lax.dynamic_update_slice(q, pos, (adr,))
            q = jax.lax.dynamic_update_slice(q, quat, (adr + 3,))
    return PhysicsState(q=q, qd=qd)


def forward_dynamics(
    model: Model,
    state: PhysicsState,
    ctrl: jax.Array,
    f_ext_world: Optional[jax.Array] = None,
    subspaces=None,
    kin: Optional[Kinematics] = None,
    dt: Optional[float] = None,
) -> jax.Array:
    """qdd from the full pipeline (no integration)."""
    subspaces = subspaces or joint_subspaces(model)
    kin = kin or compute_kinematics(model, state, subspaces)
    dt = model.dt if dt is None else dt
    M = crba(model, kin, subspaces)
    C = rnea_bias(model, kin, subspaces, f_ext_world)
    tau = actuation(model, ctrl) + passive_forces(model, state)
    damping = jnp.asarray(model.dof_damping)
    armature = jnp.asarray(model.dof_armature)
    rhs = tau - C - damping * state.qd
    A = M + jnp.diag(armature + dt * damping)
    chol = jax.scipy.linalg.cho_factor(A)
    return jax.scipy.linalg.cho_solve(chol, rhs)


def step(
    model: Model,
    state: PhysicsState,
    ctrl: jax.Array,
    f_ext_world: Optional[jax.Array] = None,
    subspaces=None,
) -> PhysicsState:
    """One dt of the full pipeline (``model.n_substeps`` internal substeps).
    Pass ``f_ext_world`` to override the computed contact+fluid forces."""
    subspaces = subspaces or joint_subspaces(model)
    n = model.n_substeps
    dt = model.dt / n
    for _ in range(n):
        kin = compute_kinematics(model, state, subspaces)
        f_ext = f_ext_world
        if f_ext is None:
            if model.contact_pairs:
                from mjrl_tpu.physics.contact import contact_forces

                f_ext = contact_forces(model, kin)
            if model.density != 0.0 or model.viscosity != 0.0:
                fluid = fluid_forces(model, kin)
                f_ext = fluid if f_ext is None else f_ext + fluid
        qdd = forward_dynamics(
            model, state, ctrl, f_ext, subspaces=subspaces, kin=kin, dt=dt
        )
        state = integrate(model, state, qdd, dt=dt)
    return state
