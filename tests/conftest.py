"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so that
numerical parity with the float64 reference implementation can be asserted
tightly. The environment variables must be set before jax is imported.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU plugin,
# but the test suite must run on a virtual 8-device host mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The ambient TPU plugin prepends itself to jax_platforms regardless of the
# environment variable; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_FIXTURES = os.path.join(
    "/root", "reference", "tests", "integration", "fixtures")


def fixture_path(name):
    return os.path.join(REFERENCE_FIXTURES, name)


def has_fixture(name):
    return os.path.isfile(fixture_path(name))


@pytest.fixture
def rng():
    return np.random.RandomState(141414)
