"""mjrl_tpu — a TPU-native on-policy RL framework.

A from-scratch rebuild of the capabilities of ``bennevans/mjrl`` (NPG / TRPO /
PPO with conjugate-gradient Fisher-vector products and KL line search,
Gaussian-MLP policies, GAE with linear/quadratic/MLP value-function baselines,
behavior cloning, DAPG demo-augmented learning), designed for JAX/XLA:

- env rollouts are ``vmap``-ed over thousands of env instances inside a
  time-major ``lax.scan`` (replacing mjrl's per-process CPU sampling,
  reference: mjrl/samplers/core.py),
- the full sample -> GAE -> natural-gradient iteration fuses into a single
  jitted SPMD program,
- multi-host scale-out shards the env axis over a ``jax.sharding.Mesh`` with
  XLA-emitted collectives for gradient and FVP reductions.

The public concept names follow mjrl (``train_step``, ``baseline.fit``,
metric keys like ``running_score``/``kl_dist``/``alpha``) so learning-curve
parity tooling can read both frameworks' logs side by side.
"""

__version__ = "0.1.0"

from mjrl_tpu.types import EnvSpec, TrajectoryBatch  # noqa: F401
