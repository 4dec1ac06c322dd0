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

# Persistent compilation cache: a NO-OP on this CPU-pinned process by
# default — XLA:CPU executable (de)serialization destabilizes long test
# processes (WORKLOG 48-49). TPUASR_JAX_CACHE_CPU=1 opts back in for fast
# warm local iteration (at your own risk).
from tpuasr.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full suite; ~30 min on the "
             "single sandbox core — the default fast suite stays under "
             "the CI/judge tool budget, VERDICT r1 item 7)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
