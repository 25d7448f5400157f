"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is tested here exactly as the driver validates it:
``xla_force_host_platform_device_count`` fakes a mesh on CPU
(SURVEY.md §4).  Env vars must be set before JAX initializes, hence the
module-level assignments ahead of any jax import.
"""

import os

# The environment pins JAX_PLATFORMS to the TPU plugin; the config.update
# below (not the env var) is what actually forces CPU for the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The suite is compile-dominated (~8 min cold on this single-core box);
# a persistent cache makes repeat runs pay device time only.  Separate
# dir from the TPU bench cache to avoid any cross-backend confusion.
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
