"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests use XLA's forced host platform device count, as the
reference never needed (SURVEY.md section 4) — real TPUs are not required for
the test suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"
