"""Test harness config: run on a virtual 8-device CPU mesh.

Must execute before jax initializes a backend.  The axon TPU plugin ignores
JAX_PLATFORMS, so we force the platform through jax.config instead."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
