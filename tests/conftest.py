"""Test configuration: force an 8-device CPU mesh.

This mirrors the reference's absent-but-needed distributed test strategy
(SURVEY §4): pjit/psum/sharding paths run in CI without TPUs via
`--xla_force_host_platform_device_count`.

NOTE: in the TPU sandbox a sitecustomize hook registers the remote-TPU
("axon") PJRT plugin in every process and forces jax_platforms="axon,cpu",
so the JAX_PLATFORMS env var alone is NOT enough — the config must be
overridden after `import jax`, before any backend is touched. The TPU
tunnel serializes clients, so tests accidentally running on it are slow and
can deadlock against a concurrent TPU job.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
