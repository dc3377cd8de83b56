"""Test config: request a virtual 8-device CPU platform.

Must run before any jax import (pytest imports conftest first).

Note: under the axon TPU tunnel JAX_PLATFORMS=cpu is ignored and
jax.devices() still returns the real chip — single-device tests then run on
TPU (useful hardware coverage). Multi-device tests must ask for
jax.devices("cpu") explicitly, which honours the 8-device flag."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
