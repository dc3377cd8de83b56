"""Test config: CPU-only JAX with a virtual 8-device platform.

Must run before any jax import (pytest imports conftest first).

The axon TPU plugin (loaded via /root/.axon_site on PYTHONPATH) force-
registers the tunneled chip and ignores JAX_PLATFORMS=cpu. The tunnel is
single-client: a test process touching it crashes or slows any concurrent
TPU job (bench, profiling). So the suite strips the axon site path and
pins JAX_PLATFORMS=cpu — tests never touch the tunnel. Set
SEGALIGN_TEST_TPU=1 to keep the plugin (tests/test_tpu_smoke.py needs it;
run that alone, with nothing else on the chip).
"""

import os
import sys

if os.environ.get("SEGALIGN_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "")
else:
    _axon = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" in p]
    if _axon:
        # stash for subprocess tests that need the real accelerator
        # (tests/test_tpu_smoke.py restores it)
        os.environ["SEGALIGN_AXON_SITE"] = os.pathsep.join(_axon)
    sys.path = [p for p in sys.path if "axon_site" not in p]
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p)
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.modules.pop("jax_plugins", None)
    # The axon sitecustomize registers at interpreter start (before this
    # file runs) when PALLAS_AXON_POOL_IPS is set, and register() force
    # -updates jax_platforms to "axon,cpu" — env vars alone can't undo
    # that. Pin the config back to cpu-only so the tunneled chip is never
    # initialized by a test process (the tunnel is single-client; a test
    # touching it crashes concurrent TPU jobs), and scrub the trigger
    # vars so pytest-spawned subprocesses never register at all.
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        os.environ["SEGALIGN_AXON_POOL_IPS"] = \
            os.environ.pop("PALLAS_AXON_POOL_IPS")
    import jax
    jax.config.update("jax_platforms", "cpu")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Route pipeline work to local CPU devices by default (the device pool
# reads SEGALIGN_DEVICES; tests/test_tpu_smoke.py overrides to tpu).
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
