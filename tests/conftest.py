"""Test env setup: force CPU with 8 virtual devices BEFORE jax initializes.

SURVEY.md §4: multi-host behavior is validated without a cluster via
``--xla_force_host_platform_device_count=8`` — sharding tests assert
host-count invariance against the single-device path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
