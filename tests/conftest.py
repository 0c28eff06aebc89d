"""Test configuration: run on an 8-device virtual CPU mesh.

Mirrors the reference's device/dtype parametrized test strategy
(SURVEY.md §4) but uses JAX's virtual host devices so multi-chip sharding
is exercised on every CI run without TPU hardware.
"""

import os

# Force CPU with 8 virtual devices regardless of the ambient environment —
# the session env pins JAX_PLATFORMS=axon (one remote TPU chip), which is
# far too slow for a test matrix and has no multi-device mesh. The axon
# sitecustomize pre-imports jax, so env vars alone are too late; we must go
# through jax.config before any backend is touched.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import pytest

# NOTE on compile caching (VERDICT r4 item 4): a persistent XLA:CPU cache
# was tried here and REVERTED — the AOT loader warned "machine type used
# for compilation doesn't match the machine for execution … could lead to
# SIGILL" on this pool's heterogeneous hosts, which risks silently wrong
# test results. Suite wall time is managed by the slow-marker tier
# instead (default run skips `slow`; --runslow enables everything).


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (heavy fuzz/parity/VO legs; mirrors "
             "the reference's --runslow tier, TESTING.md:60-68)")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
