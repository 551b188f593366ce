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

# Persistent compilation cache: warm repeat-suite runs measure 7m25 vs
# ~16m cold (r5). The r5 full-suite segfaults that appeared inside the
# cache's zstd (de)serialization were NOT the cache's fault — they were
# vm.max_map_count exhaustion (see _bound_jit_mmap_growth below); with
# maps bounded, cold-cache/warm-cache/no-cache full runs are all
# exit-0 stable. Set CUDACAM_TEST_COMPILE_CACHE= (empty) to disable.
_cache_dir = os.environ.get("CUDACAM_TEST_COMPILE_CACHE",
                            "/tmp/cudacam_jax_cache")
if _cache_dir:
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


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_mmap_growth():
    """Clear jax's executable caches between test modules.

    Root cause (r5, diagnosed by polling /proc/<pid>/maps during a full
    run): every compiled executable holds JIT'd code in mmap'd regions
    and the process-global caches keep them all alive, so the full suite
    crosses the default vm.max_map_count (65530) around the ~200-test
    mark — at which point mmap failures SEGFAULT LLVM inside
    backend_compile_and_load (and, with the persistent cache enabled,
    inside its zstd (de)serialization). Observed as nondeterministic
    full-suite-only crashes whose location moved with test ordering;
    every affected test passes standalone. Dropping the caches per
    module munmaps dead executables and bounds the map count; modules
    recompile their own shapes anyway, so the wall-time cost is small.
    """
    yield
    import jax

    jax.clear_caches()


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
