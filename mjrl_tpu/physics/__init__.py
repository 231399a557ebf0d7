"""First-party MJX-style rigid-body physics (pure JAX, vmappable).

Replaces the reference's MuJoCo/mujoco_py dependency (SURVEY.md §2.2):
``engine.step`` is a pure function over an explicit ``PhysicsState``,
designed to ``vmap`` over thousands of env instances inside a rollout scan.
"""

from mjrl_tpu.physics.model import (  # noqa: F401
    BALL,
    BOX,
    CAPSULE,
    CYLINDER,
    FREE,
    HINGE,
    PLANE,
    SLIDE,
    SPHERE,
    Model,
    ModelBuilder,
)
from mjrl_tpu.physics.engine import (  # noqa: F401
    PhysicsState,
    compute_kinematics,
    crba,
    forward_dynamics,
    forward_kinematics,
    joint_subspaces,
    rnea_bias,
    step,
)
