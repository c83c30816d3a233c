"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so that
numerical parity with the float64 reference implementation can be asserted
tightly. The environment variables must be set before jax is imported.

Set ``MF_TEST_X64=0`` to run with x64 DISABLED — the float32 production
configuration (what a default TPU runtime uses). Tests that specifically
assert float64-parity behavior call ``require_x64()`` and skip there.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU plugin,
# but the test suite must run on a virtual 8-device host mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
_X64 = os.environ.get("MF_TEST_X64", "1") != "0"
os.environ["JAX_ENABLE_X64"] = "true" if _X64 else "false"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", _X64)
# The ambient TPU plugin prepends itself to jax_platforms regardless of the
# environment variable; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the suite: wall time is dominated by
# ONE-TIME compiles of the big unrolled df-scan programs (40-70 s each on a
# 1-core host; the suite deliberately shares one shape family per program
# so there are few of them). Caching the executables on disk makes every
# later suite run warm. XLA:CPU executables are machine-feature sensitive,
# but a test cache is only ever read back on the machine that wrote it.
# Opt out with MF_TEST_NO_COMPILE_CACHE=1. The x64 flag is part of the
# program, so the f32 lane shares the same directory without conflicts.
if os.environ.get("MF_TEST_NO_COMPILE_CACHE") != "1":
    _cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                              "microstructure_fingerprinting_tpu",
                              "xla_cache_tests")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_FIXTURES = os.path.join(
    "/root", "reference", "tests", "integration", "fixtures")


def require_x64():
    """Skip the calling test under the float32 (MF_TEST_X64=0) lane."""
    if not jax.config.jax_enable_x64:
        pytest.skip("float64-parity test (x64 runtime only)")


def fixture_path(name):
    return os.path.join(REFERENCE_FIXTURES, name)


def has_fixture(name):
    return os.path.isfile(fixture_path(name))


@pytest.fixture
def rng():
    return np.random.RandomState(141414)


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_executables():
    """Drop compiled executables between test modules.

    The suite JIT-compiles many large unrolled programs (the off-TPU df
    scans keep their tile loops statically unrolled); keeping every
    executable alive for the whole session has produced segfaults in
    late-session XLA CPU compilations/executions once the accumulated
    JIT code crossed a process-level threshold. Modules rarely share
    compiled graphs, so per-module cache clearing costs little."""
    yield
    jax.clear_caches()
