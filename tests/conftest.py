"""Test configuration: force an 8-device virtual CPU platform.

Tests never require real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (xla_force_host_platform_device_count), per the project's
test strategy (SURVEY.md §4).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
