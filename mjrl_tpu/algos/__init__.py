"""Agents (reference: mjrl/algos/): REINFORCE, NPG, TRPO, PPO, BC, DAPG,
model-accelerated NPG (reference: mjrl/algos/model_accel/)."""

from mjrl_tpu.algos.base import AgentState, BatchREINFORCE  # noqa: F401
from mjrl_tpu.algos.npg import NPG  # noqa: F401
from mjrl_tpu.algos.trpo import TRPO  # noqa: F401
from mjrl_tpu.algos.ppo import PPO  # noqa: F401
from mjrl_tpu.algos.bc import BC  # noqa: F401
from mjrl_tpu.algos.dapg import DAPG  # noqa: F401
from mjrl_tpu.algos.model_npg import ModelAccelNPG, ModelAgentState  # noqa: F401
