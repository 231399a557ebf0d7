"""On-device trajectory sampling (reference: mjrl/samplers/)."""

from mjrl_tpu.samplers.rollout import (  # noqa: F401
    RolloutStats,
    rollout_statistics,
    sample_autoreset,
    sample_episodes,
)
