"""Test configuration: force an 8-virtual-device CPU backend.

Tests run hermetically on CPU (XLA CPU backend) with 8 virtual devices so
multi-chip sharding paths (`jax.sharding.Mesh` + pjit/shard_map) are exercised
without TPU hardware — the strategy SURVEY.md §4 prescribes. Env vars must be
set before the first jax import, hence at module import time here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the remote 'axon' TPU platform
# (and overrides JAX_PLATFORMS); pin the platform back to CPU explicitly so
# tests are hermetic and fast.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # allow float64 checks in oracles

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
