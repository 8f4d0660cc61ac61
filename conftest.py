"""Pytest root conftest: force an 8-device CPU platform BEFORE any test runs.

This image pins jax_platforms to "axon,cpu" (tunneled TPU) regardless of the
JAX_PLATFORMS env var, so we override via jax.config. Multi-chip sharding is
validated on a virtual CPU mesh (xla_force_host_platform_device_count=8) —
the JAX-native way to test multi-device code without a pod (SURVEY.md §4).
The real chip is exercised by bench.py and the driver's compile checks.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
