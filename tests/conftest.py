"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests use XLA's forced host platform device count, as the
reference never needed (SURVEY.md section 4) — real TPUs are not required for
the test suite.

Note: this environment pre-imports jax at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars are too late — the backend
must be forced through jax.config before any device is touched. XLA_FLAGS is
still read at backend-initialization time, so setting it here works.
"""

import os
import pathlib

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"
