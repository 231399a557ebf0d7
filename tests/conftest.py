"""Test env setup: force CPU with 8 virtual devices BEFORE the backend inits.

SURVEY.md §4: multi-host behavior is validated without a cluster via
``--xla_force_host_platform_device_count=8`` — sharding tests assert
host-count invariance against the single-device path.

NOTE this environment pre-imports jax via a sitecustomize hook with
``JAX_PLATFORMS=axon`` (the TPU tunnel), so setting the env var here is too
late — the config must be updated through ``jax.config`` before any backend
is touched. Running tests on CPU also keeps the single TPU chip free (it is
exclusively locked by whichever process initializes it first).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: physics substeps are large traced programs
# (seconds to minutes of XLA:CPU compile each); caching them makes repeat
# suite runs minutes faster. Keyed on jaxlib version + HLO, so stale
# entries are never reused.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
