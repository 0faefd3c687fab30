"""Test env: force CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (the 'fake backend' substitute, SURVEY.md §4).

NOTE: this image's axon TPU plugin overrides the JAX_PLATFORMS env var, so
we must force the platform via jax.config *before* backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
