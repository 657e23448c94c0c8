"""Test configuration: force an 8-device virtual CPU platform.

Tests never require real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (xla_force_host_platform_device_count), per the project's
test strategy (SURVEY.md §4).
"""

import os

# Must be set before the CPU backend initialises. Forced (not setdefault):
# the session environment pins JAX_PLATFORMS to the TPU plugin and the
# plugin re-appends itself to jax_platforms, so the env var alone is not
# enough — jax.config.update below is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
# Forced, like JAX_PLATFORMS above: a pre-existing flag with a different
# device count (leaked from a bench script or CI env) would otherwise
# survive the substring check and abort the session on the assert below.
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=8"]
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert len(jax.devices()) == 8, (
    f"tests require the virtual 8-device CPU platform, got {jax.devices()}"
)
