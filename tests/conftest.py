"""Test harness: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4 'fake-mesh' plan).

Note: the sandbox registers an 'axon' TPU PJRT plugin from sitecustomize, so
JAX_PLATFORMS env alone is not enough — we must override jax.config after
import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
