"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
is exercised without TPU hardware (the driver separately dry-runs the mesh
path, and bench.py runs on the real chip). Pallas kernels run in interpreter
mode on CPU.
"""
import os

# Must happen before jax is imported anywhere. Force CPU: the ambient
# environment points JAX at the axon TPU tunnel, but the suite is designed to
# run hermetically on 8 virtual CPU devices (set CUDACAM_TESTS_ON_TPU=1 to
# opt in to running the TPU-marked tests on real hardware).
if not os.environ.get("CUDACAM_TESTS_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not os.environ.get("CUDACAM_TESTS_ON_TPU"):
    # Something in this environment re-registers the TPU plugin with priority
    # regardless of JAX_PLATFORMS; pin the platform list explicitly.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles many shape-distinct
# pipelines (the bit-packed hysteresis traces are large); caching compiled
# executables across runs cuts repeat-suite wall time substantially.
_cache_dir = os.environ.get("CUDACAM_TEST_COMPILE_CACHE",
                            "/tmp/cudacam_jax_cache")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is an optimization only
    pass
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_bgr_frame(rng, h, w):
    """Random-but-smooth BGR frame: random low-res field upsampled, so it has
    realistic gradients rather than salt-and-pepper noise."""
    small = rng.integers(0, 256, size=(max(2, h // 8), max(2, w // 8), 3), dtype=np.uint8)
    reps_y = -(-h // small.shape[0])
    reps_x = -(-w // small.shape[1])
    big = np.repeat(np.repeat(small, reps_y, axis=0), reps_x, axis=1)[:h, :w]
    return np.ascontiguousarray(big)


def make_noise_frame(rng, h, w, channels=3):
    shape = (h, w, channels) if channels == 3 else (h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.fixture(scope="session")
def bgr_frame(rng):
    return make_bgr_frame(rng, 72, 96)


@pytest.fixture(scope="session")
def noise_frame(rng):
    return make_noise_frame(rng, 48, 64)
