"""Test configuration: force the JAX CPU backend with 8 virtual devices so
mesh/pjit logic is exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-registers a TPU PJRT plugin via sitecustomize
and pins ``JAX_PLATFORMS`` in the process env, so we must override through
``jax.config`` (which wins as long as no backend has been initialised yet)
rather than ``os.environ``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
