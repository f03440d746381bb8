"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Multi-chip hardware is unavailable in CI; sharding correctness is validated
on a virtual 8-device CPU mesh exactly as the driver's dryrun does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; force CPU
# through the config API (must happen before any computation runs).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
