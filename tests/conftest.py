"""Test configuration: run everything on CPU (the axon TPU tunnel pins
JAX_PLATFORMS=axon in the environment, so override via jax.config), with
float64 enabled for tight physics tolerances, and 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
