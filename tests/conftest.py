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

# Route pipeline work to local CPU devices by default: CPU compiles are
# local and fast, whereas the axon TPU tunnel compiles remotely (minutes per
# new program shape) and is single-client. Set SEGALIGN_DEVICES=tpu (or
# unset) for on-hardware runs; tests/test_tpu_smoke.py covers the real chip.
os.environ.setdefault("SEGALIGN_DEVICES", "cpu")


def pytest_configure(config):
    if os.environ.get("SEGALIGN_TEST_NO_DEFAULT_DEVICE"):
        return
    import jax
    try:
        cpu = jax.devices("cpu")[0]
        jax.config.update("jax_default_device", cpu)
    except Exception:
        pass
