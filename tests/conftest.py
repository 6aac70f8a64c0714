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



# ---------------------------------------------------------------- quick tier
# `pytest -m quick` = the sub-minute regression set (live-reference A/B,
# host pipeline parity, kernels-free op tests) — < 10 min on this box vs
# ~80 min for the full suite (which additionally compiles full-step
# training graphs).  Keep heavy files (train_step, loop_e2e, fsdp,
# reference_phase_ab, models, multiprocess) OUT of this list.
QUICK_FILES = {
    "test_flops.py", "test_geometry.py", "test_misc_parity.py",
    "test_fast_batch_parity.py", "test_aug_batch_parity.py",
    "test_datasets_protocol.py", "test_cli.py",
    "test_ccssl_support_ab.py", "test_ccssl_reference_ab.py",
    "test_vis_tables.py", "test_seg_labelers.py", "test_codec_losses.py",
    "test_image_cloud_ops.py", "test_data_tools.py",
    "test_skeleton_export.py", "test_torch_import.py", "test_mano.py",
    "test_tapsum.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: sub-minute regression tests (pytest -m quick)")


def pytest_collection_modifyitems(config, items):
    import os as _os
    import pytest as _pytest
    for item in items:
        if _os.path.basename(str(item.fspath)) in QUICK_FILES:
            item.add_marker(_pytest.mark.quick)
