"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports.

The reference has no tests (SURVEY.md §4); this suite is the new framework's
test pyramid. Multi-device logic runs against a faked 8-device CPU platform
(xla_force_host_platform_device_count) so sharding/collective code is exercised
without TPU hardware; Pallas kernels run in interpreter mode on CPU.
"""

import os

# NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS env
# var; jax.config.update is authoritative (and JAX_PLATFORM_NAME as a backstop).
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on the virtual CPU mesh, got {jax.default_backend()}"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()}"
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
