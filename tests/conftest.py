"""Test harness configuration.

Runs everything on CPU with 8 virtual devices so multi-chip sharding tests
work without a TPU pod (SURVEY §4: the TPU analog of the reference's
fake-backend precedents), and enables x64 so oracles can be computed in
double precision.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on CPU (override axon/tpu)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax is pre-imported at interpreter startup in this environment, so the env
# vars above may have been bound already -- override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the df64 interpret-mode kernels jit big graphs
# (minutes of XLA:CPU compile); repeat runs hit the cache instead
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    # dd_compile_heavy implies slow: a CLI `-m 'not slow'` REPLACES the
    # addopts `-m 'not dd_compile_heavy'` (pytest keeps only the last -m),
    # which would silently pull the ~65-min df64 interpret compiles into
    # the fast subset.  Tagging them slow here makes every marker
    # combination exclude them unless dd_compile_heavy is requested
    # explicitly.
    for item in items:
        if "dd_compile_heavy" in item.keywords:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
