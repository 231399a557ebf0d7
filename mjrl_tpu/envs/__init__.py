"""First-party environments (reference: mjrl/envs/).

Import side effects populate the registry; use ``envs.make(env_id)``.
"""

from mjrl_tpu.envs.base import Env, make, register, registered_envs  # noqa: F401
import mjrl_tpu.envs.point_mass  # noqa: F401
import mjrl_tpu.envs.classic  # noqa: F401
import mjrl_tpu.envs.locomotion  # noqa: F401

try:  # Adroit requires the mujoco wheel (MJCF front-end) + assets
    import mjrl_tpu.envs.adroit  # noqa: F401
except ImportError:  # pragma: no cover - mujoco/gymnasium_robotics absent
    pass
