"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled (the TPU bench path chooses platform/dtype separately).

Note: this environment force-registers a TPU PJRT plugin from
sitecustomize.py at interpreter startup and pins JAX_PLATFORMS to it, so we
must re-point the platform via jax.config (env vars are too late/ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
