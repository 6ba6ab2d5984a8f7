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

# The axon sitecustomize force-registers the TPU backend via jax.config,
# which overrides the env var — override it back. Tests NEVER touch the
# (single, tunnel-shared) TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the model-heavy tests are compile-bound on
# this host; caching makes re-runs near-instant.
jax.config.update("jax_compilation_cache_dir", "/tmp/wetts_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# NOTE: the mesh-trainer tests (test_train.py::test_trainer_two_steps_...,
# test_summary.py::test_trainer_writes_tb) re-invoke themselves in a fresh
# subprocess — jaxlib 0.9.0's XLA:CPU compiler intermittently segfaults
# compiling that executable in a long-lived process (tests/isolation.py).
