"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the idiomatic JAX answer to "test multi-chip without a cluster":
--xla_force_host_platform_device_count=8 fakes 8 devices on host CPU so
sharding/collective code paths compile and execute for real.

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers a TPU PJRT plugin), so JAX_PLATFORMS env vars set here are too
late — we must go through jax.config before the backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
