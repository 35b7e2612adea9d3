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

# small work-queue quantum for CPU tests: the production default (32k) is
# sized for the chip; on the CPU backend every masked window row executes
# for real, so tests would crawl (and the big while_loop body compiles for
# minutes). 256 stresses the ordering logic harder anyway.
os.environ.setdefault("FLOXER_TPU_WQ_QUANTUM", "256")

import jax

jax.config.update("jax_platforms", "cpu")

import signal

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout(seconds): abort the test if it runs longer. pytest-timeout "
        "is not installed in this image; this SIGALRM-based implementation "
        "(conftest.py) makes the mark real so a hung distributed test is "
        "killed instead of wedging CI.",
    )


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    if marker is None or not marker.args:
        return (yield)
    seconds = int(marker.args[0])

    def on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded its timeout mark of {seconds} seconds"
        )

    previous = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, previous)


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"
