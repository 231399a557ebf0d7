"""Multi-chip/multi-host parallelism layer (SPMD over a device mesh)."""

from mjrl_tpu.parallel.mesh import (  # noqa: F401
    ENV_AXIS,
    env_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_env_pytree,
)
