"""Training harness utilities: logging, plots, checkpointing, configs."""

from mjrl_tpu.utils.logger import DataLog  # noqa: F401
from mjrl_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from mjrl_tpu.utils.configs import RunConfig, build  # noqa: F401
from mjrl_tpu.utils.train_agent import train_agent  # noqa: F401
from mjrl_tpu.utils.plots import make_train_plots  # noqa: F401
from mjrl_tpu.utils.evaluation import evaluate_policy, export_rollout  # noqa: F401
