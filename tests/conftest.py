"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests run against
a virtual 8-device CPU mesh, which exercises the same GSPMD partitioning
paths XLA uses on a real TPU slice.  Must run before jax is imported.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have force-registered a TPU backend
# before this conftest runs; jax.config wins over the env var in that case.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES
