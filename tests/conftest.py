"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding tests run on a simulated mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the standard JAX
multi-host testing recipe. Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
