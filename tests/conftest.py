"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``), the TPU-world equivalent of
"multi-node tests without a cluster".  These environment variables must be
set before ``jax`` is imported anywhere, which pytest guarantees by importing
conftest first.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# In this environment jax may already be imported at interpreter startup with
# the TPU ("axon") platform selected, so the env var route is too late —
# switch platforms through the config API before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
