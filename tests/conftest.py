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

# persistent compile cache: this host has ONE cpu core, so XLA compiles
# dominate test wall-clock; identical traces across runs (and across tests
# in one run, via the in-memory cache) hit the disk cache instead
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
