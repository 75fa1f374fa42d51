"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md section 4 test plan, item d).
Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache: the row-scan kernels recompile per (shape,
# params) bucket.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/tsta_jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# This machine's sitecustomize registers a remote-TPU ("axon") PJRT plugin
# and force-sets jax_platforms="axon,cpu", overriding the env var; left
# alone, "CPU" tests silently run on the remote TPU through a relay with
# multi-minute stalls.  jax is already imported by sitecustomize, so
# re-override the config *before any backend initialises*.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False,
                     help="run slow (multi-minute) golden tests")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-minute golden tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow") or os.environ.get("TSTA_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; use --run-slow or TSTA_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def golden_dir():
    return GOLDEN
