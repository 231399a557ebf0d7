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

import jax as _jax

# Physics correctness requires f32 contractions: with the TPU default
# ("bfloat16") the engine's small einsums (rotations, inertia products) run
# at ~3 significant digits whenever XLA routes them to the MXU — under jit
# they usually fuse into f32 VPU ops, but EAGER execution hits the MXU
# op-by-op and measurably corrupts rollouts (a trained hopper's episode
# length drops ~10x when evaluated eagerly). f32 precision costs nothing
# at this framework's matmul sizes. Re-override after import if you know
# what you're doing.
_jax.config.update("jax_default_matmul_precision", "float32")

from mjrl_tpu.types import EnvSpec, TrajectoryBatch  # noqa: F401
