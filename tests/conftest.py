"""Test harness: force an 8-device virtual CPU mesh before JAX initialises.

This mirrors how the driver validates the multi-chip path (SURVEY.md §4):
``xla_force_host_platform_device_count`` gives N independent XLA CPU devices
so pjit/shard_map/mesh code paths are exercised without TPU hardware.
"""

import os

# Set DEEPSENSORNZ_TEST_BACKEND=tpu to run the suite against real hardware
# (cross-backend assurance; much slower — compiles go through the device).
_REAL = os.environ.get("DEEPSENSORNZ_TEST_BACKEND", "cpu") != "cpu"

if not _REAL:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if not _REAL:
    # A sitecustomize.py may have pre-registered a TPU backend and pinned
    # jax_platforms before this conftest runs; the config update wins as
    # long as no computation has executed yet.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
