"""Test harness setup: force the CPU backend with 8 virtual devices.

The sandbox's sitecustomize registers the experimental axon TPU plugin and sets
JAX_PLATFORMS=axon; we override in-process (before any backend is initialized)
so the whole suite runs on CPU, and multi-device sharding tests get an 8-device
virtual mesh (SURVEY.md section 4.2).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
