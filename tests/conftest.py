"""Test configuration: CPU backend, 8 virtual devices, 64-bit precision.

Mirrors the reference's CI strategy translated to JAX (SURVEY.md §4): the
1e-13 f64/c128 oracle tolerance requires the CPU backend (TPUs have no native
f64); multi-chip sharding is tested on a virtual 8-device CPU mesh -- the
standard JAX analog of testing multi-node without a cluster.

Note: the environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (the TPU tunnel), so the platform must be overridden
via jax.config.update, not env vars, and XLA_FLAGS must be set before the
first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

# On-chip tier (tests/test_tpu.py): BST_TPU_TESTS=1 keeps the default axon
# TPU platform and f32; everything else runs the f64 CPU oracle suite.
TPU_TIER = os.environ.get("BST_TPU_TESTS") == "1"

if TPU_TIER:
    _CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tpu")
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: the suite is compile-bound on CPU (many
    # distinct bucket-shape graphs); caching makes re-runs fast.
    _CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: on-chip tests (run with BST_TPU_TESTS=1 on a TPU)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not TPU_TIER:
            item.add_marker(pytest.mark.skip(
                reason="TPU tier: set BST_TPU_TESTS=1 on a TPU host"))
        elif "tpu" not in item.keywords and TPU_TIER:
            item.add_marker(pytest.mark.skip(
                reason="CPU oracle suite: unset BST_TPU_TESTS"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
