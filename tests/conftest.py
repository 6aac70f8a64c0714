"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backend, so this module
performs the setup at import time (pytest imports conftest first).
"""

import os

# force CPU: the environment pre-sets JAX_PLATFORMS=axon (one real TPU)
# AND pre-imports jax at interpreter startup, so env vars alone are too
# late — update the live config instead (backends init lazily).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the heavy train-step graphs compile once
# per machine instead of once per pytest invocation
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

