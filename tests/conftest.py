"""Test configuration: run on CPU with 8 virtual devices.

This substitutes for the reference's missing fake backend (SURVEY.md section 4):
multi-"chip" sharding tests execute on a virtual 8-device CPU mesh exactly as
they would on a TPU pod slice.
"""
import os

import pytest

# Force CPU: the session environment pins JAX_PLATFORMS to the tunneled TPU
# backend, which must not be contended by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Test tiers: the sharded-vs-serial trajectory comparisons, subprocess
# multihost clusters and long conservation runs dominate the suite's wall
# time (the full run is >1h on a 1-core box).  They are auto-marked `slow`
# so `make test` (-m "not slow") stays a pre-commit-sized tier;
# `make test-full` / `./runtests.sh` run everything.
SLOW_MODULES = {
    "test_multidevice", "test_multihost", "test_conservation",
    "test_checkpoint", "test_sweep_impl", "test_halfshell",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tier (trajectory comparisons, "
        "multihost subprocess clusters, conservation runs)")
    config.addinivalue_line(
        "markers", "fast: opt-out of the module-granular slow marking for "
        "cheap unit tests that live in otherwise-slow modules")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__.rsplit(".", 1)[-1] in SLOW_MODULES
                and item.get_closest_marker("fast") is None):
            item.add_marker(pytest.mark.slow)
