"""Function approximators: Gaussian policies and value-function baselines."""

from mjrl_tpu.models.gaussian_mlp import GaussianLinear, GaussianMLP  # noqa: F401
from mjrl_tpu.models.baselines import (  # noqa: F401
    Baseline,
    LinearBaseline,
    MLPBaseline,
    QuadraticBaseline,
    ZeroBaseline,
)
from mjrl_tpu.models.mlp import apply_mlp, identity_transforms, init_mlp  # noqa: F401
