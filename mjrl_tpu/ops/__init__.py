"""Math core: distributions, GAE, conjugate gradient, raveling, ridge solves."""

from mjrl_tpu.ops.distributions import DiagGaussian  # noqa: F401
from mjrl_tpu.ops.gae import compute_advantages, compute_returns, discount_sum  # noqa: F401
from mjrl_tpu.ops.cg import cg_solve  # noqa: F401
from mjrl_tpu.ops.ravel import ravel_pytree, unravel_like  # noqa: F401
from mjrl_tpu.ops.lstsq import ridge_solve  # noqa: F401
