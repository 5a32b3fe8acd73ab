"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This mirrors the reference's absent-but-needed distributed test strategy
(SURVEY §4): pjit/psum/sharding paths run in CI without TPUs via
`--xla_force_host_platform_device_count`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
