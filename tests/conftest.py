"""Test configuration: run on a virtual 8-device CPU mesh.

Must set XLA flags before jax is first imported anywhere in the test
session, so this sits at the top of conftest. Mirrors the reference's CI
strategy (tests/conftest.py there gates slow tests; here we additionally
force CPU so sharding tests see 8 devices without TPU hardware).
"""

import os

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# Force CPU with 8 virtual devices. NOTE: the JAX_PLATFORMS *env var* is
# ignored under the axon TPU plugin in this image — only the config API
# works. Tests must never touch the (single, exclusive) TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache: first test session pays the compiles,
# every later session (and the driver's pytest runs) reuses them.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False, help="run slow tests")


def pytest_collection_modifyitems(config, items):
    if not config.getoption("--slow"):
        skip = pytest.mark.skip(reason="needs --slow")
        for item in items:
            if "slow" in item.keywords:
                item.add_marker(skip)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
