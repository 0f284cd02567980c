"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Nothing in the framework's numerics needs a physical TPU to validate
(SURVEY.md §4): single-device tests run on CPU, and multi-chip sharding tests
use the standard host-device-count trick over the same Mesh/pjit code paths
that run on a real slice.
"""

import os
import pathlib

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var JAX_PLATFORMS is pinned to "axon" by the harness sitecustomize
# and survives os.environ edits; the config update below is what actually
# forces the CPU backend. Set TRT_TEST_PLATFORM to run the suite on a real
# backend instead (e.g. TRT_TEST_PLATFORM=axon for tests/test_tpu_smoke.py).
jax.config.update("jax_platforms",
                  os.environ.get("TRT_TEST_PLATFORM", "cpu"))

# Persistent compilation cache: the quartic-heavy render graphs take ~1 min
# each to compile on CPU XLA; cache them across test runs.
_cache = pathlib.Path(__file__).resolve().parent / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live executables/tracing caches after every test module.

    A single pytest process accumulates XLA:CPU compiler state across the
    suite's ~170 graphs; on a 1-vCPU host the compiler ABORTS (SIGABRT,
    faulthandler dump ends in pxla _cached_compilation) partway through
    test_sharding — deterministically in full-suite order, never when the
    module runs alone. Clearing between modules bounds the live state;
    the persistent disk cache above makes any re-trace cheap."""
    yield
    jax.clear_caches()
