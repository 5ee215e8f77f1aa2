"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the multi-chip validation path: sharding/pjit tests run on
xla_force_host_platform_device_count=8 CPU devices, never on the real TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and pins
# JAX_PLATFORMS=axon before user code runs; override it programmatically.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
