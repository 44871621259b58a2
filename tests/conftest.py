"""Test configuration: run on CPU with 8 virtual devices.

This substitutes for the reference's missing fake backend (SURVEY.md section 4):
multi-"chip" sharding tests execute on a virtual 8-device CPU mesh exactly as
they would on a TPU pod slice.
"""
import os

# Force CPU: the session environment pins JAX_PLATFORMS to the tunneled TPU
# backend, which must not be contended by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
