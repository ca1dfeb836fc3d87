"""Test harness config: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a host-platform mesh as the
TPU-parity substitute for real multi-chip hardware. Must run before jax
is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the TPU backend and overrides
# JAX_PLATFORMS; this config update wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (full suite >40 min on the CPU "
        "platform); deselect with -m 'not slow' for a <5 min gate")
