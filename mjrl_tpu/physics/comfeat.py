"""Com-based body features: MuJoCo's cinert / cvel / qfrc_actuator / cfrc_ext.

Gym's Humanoid task observes, besides qpos/qvel, four mjData arrays
(gymnasium humanoid_v4; reference trains on the same task through old gym —
SURVEY.md §2.1 custom envs): ``cinert (nbody, 10)``, ``cvel (nbody, 6)``,
``qfrc_actuator (nv,)`` and ``cfrc_ext (nbody, 6)``. This module computes
the same quantities from our kinematics so the humanoid observation is the
full 376-dim gym stack.

Conventions (verified numerically vs mujoco 3.10 in tests/test_comfeat.py):

- the reference point is the subtree center of mass of the robot root
  (``mjData.subtree_com[rootid]``), world axes;
- ``cinert`` rows pack ``[Ixx Iyy Izz Ixy Ixz Iyz, m*d (3), m]`` where
  ``I`` is the body's rotational inertia about that point and
  ``d = body_com - subtree_com``;
- ``cvel`` rows are ``[omega (3), v_of_point_at_subtree_com (3)]``;
- ``cfrc_ext`` rows are ``[torque_about_subtree_com (3), force (3)]``;
- row 0 is the world body (all zeros), matching mjData layout.

MuJoCo "bodies" map to our NAMED links: the MJCF loader splits multi-joint
bodies into massless ``__stage`` links ending in the named link, which
carries the body's mass, geoms, and post-joint frame — so per-body features
are exactly the named link's features, in document (= mjData body) order.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.physics import math3d as m3
from mjrl_tpu.physics.engine import Kinematics, actuation
from mjrl_tpu.physics.model import Model


def body_links(model: Model) -> np.ndarray:
    """Our link index of each MuJoCo body (excluding world), body order."""
    return np.asarray(
        [i for i, n in enumerate(model.link_name) if "__stage" not in n],
        np.int32,
    )


def com_features(
    model: Model,
    kin: Kinematics,
    state=None,
    ctrl: Optional[jax.Array] = None,
    f_ext_world: Optional[jax.Array] = None,
):
    """(cinert (nb+1, 10), cvel (nb+1, 6), qfrc_actuator (nv,),
    cfrc_ext (nb+1, 6)) with the world row prepended, mjData layout."""
    links = body_links(model)
    R = m3.quat_to_mat(kin.quat)  # (nlink, 3, 3)
    mass = jnp.asarray(model.link_mass)
    com_abs = kin.pos + jnp.einsum(
        "lij,lj->li", R, jnp.asarray(model.link_com)
    )
    total = jnp.sum(mass)
    subtree_com = jnp.sum(mass[:, None] * com_abs, axis=0) / total

    mb = mass[links]
    d = com_abs[links] - subtree_com  # (nb, 3)
    i_com_w = jnp.einsum(
        "lij,ljk,lmk->lim",
        R[links],
        jnp.asarray(model.link_inertia_com)[links],
        R[links],
    )
    dd = jnp.sum(d * d, axis=-1)
    I = i_com_w + mb[:, None, None] * (
        dd[:, None, None] * jnp.eye(3) - d[:, :, None] * d[:, None, :]
    )
    cinert = jnp.concatenate(
        [
            I[:, 0, 0:1], I[:, 1, 1:2], I[:, 2, 2:3],
            I[:, 0, 1:2], I[:, 0, 2:3], I[:, 1, 2:3],
            mb[:, None] * d,
            mb[:, None],
        ],
        axis=-1,
    )  # (nb, 10)

    # spatial velocity about the subtree com: v_c = v_o + w x (c - o)
    c_rel = subtree_com - kin.origin
    w = kin.cvel[links, :3]
    v_c = kin.cvel[links, 3:] + jnp.cross(w, jnp.broadcast_to(c_rel, w.shape))
    cvel = jnp.concatenate([w, v_c], axis=-1)

    qfrc_act = (
        actuation(model, ctrl, state)
        if ctrl is not None
        else jnp.zeros(model.nv)
    )

    if f_ext_world is not None:
        # wrench about origin -> about subtree com: n_c = n_o - c_rel x F
        F = f_ext_world[links, 3:]
        n_c = f_ext_world[links, :3] - jnp.cross(
            jnp.broadcast_to(c_rel, F.shape), F
        )
        cfrc = jnp.concatenate([n_c, F], axis=-1)
    else:
        cfrc = jnp.zeros((links.size, 6))

    pad = lambda x: jnp.concatenate([jnp.zeros((1, x.shape[1])), x], axis=0)
    return pad(cinert), pad(cvel), qfrc_act, pad(cfrc)
