"""Test harness: force the CPU backend with 8 virtual devices so sharding
tests exercise real pjit/shard_map/psum semantics without TPU hardware."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference/gpu_path_tracer"


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference_assets = pytest.mark.skipif(
    not reference_available(), reason="reference asset tree not mounted"
)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The round-5 suite (~130 tests incl. big differentiable and shard_map
    programs) accumulated enough in-process compiler state that XLA:CPU
    segfaulted INSIDE backend_compile partway through tests/test_sharding.py
    (reproducible only with the full-suite history, not with any two files).
    Dropping executables between modules keeps the compiler healthy; each
    module's own caching is unaffected.
    """
    yield
    jax.clear_caches()
