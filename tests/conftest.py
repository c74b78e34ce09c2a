"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX mechanism for testing multi-device sharding without
real hardware (SURVEY.md §4): the distributed BA / pose-graph tests shard
over these fake devices and assert numerical equality with the single-device
solve.

Note: this environment's sitecustomize registers a TPU ('axon') backend and
force-sets jax_platforms at interpreter start, so we must override via
jax.config.update (env vars alone are ignored once jax is imported).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
