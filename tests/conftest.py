"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, and enable x64 before anything imports jax."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("BEMSTOKES_X64", "1")

# This machine's sitecustomize pre-imports jax and pins the platform to the
# axon TPU tunnel; flip it back to CPU *after* import (env vars are too late).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_GRIDS = "/root/reference/tests/grid_test"
DEBUG_GRIDS = "/root/reference/debug_grids"


@pytest.fixture(scope="session")
def reference_grid_dir():
    return REFERENCE_GRIDS


@pytest.fixture(scope="session")
def debug_grid_dir():
    return DEBUG_GRIDS
