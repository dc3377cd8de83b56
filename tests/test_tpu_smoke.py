"""On-hardware smoke test: one real chunk on the actual accelerator.

The rest of the suite runs on local CPU devices (fast local compiles); this
test keeps coverage of the real TPU path. It runs in a SUBPROCESS with a
clean JAX config: mixing jax_default_device=cpu (the conftest default) with
explicitly TPU-placed buffers produces broken mixed-device programs under
the axon backend.

Skipped when no accelerator is available. The subprocess gets a generous
timeout: the axon backend compiles remotely and the first-ever compile of
the pipeline's programs can take minutes (cached persistently afterwards).
"""

import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import numpy as np, jax
import segalign_tpu
from segalign_tpu.config import make_seed_config, build_substitution_matrix
from segalign_tpu.pipeline.device import DeviceAligner
from segalign_tpu.oracle import reference as oracle

accel = [d for d in jax.devices() if d.platform != "cpu"]
assert accel, "no accelerator"
rng = np.random.default_rng(3)
sc = make_seed_config("12of19")
sub = build_substitution_matrix(910)
n = 120_000
CHUNK = 50_000
ref = rng.integers(0, 4, n).astype(np.uint8)
query = rng.integers(0, 4, n).astype(np.uint8)
core = rng.integers(0, 4, 800).astype(np.uint8)
ref[30_000:30_800] = core
query[7_000:7_800] = core
qrc = np.array([3, 2, 1, 0, 4, 5, 6, 7], np.uint8)[query[::-1]]

# production device-buffer shapes (HBUF default): the known-good TPU config
al = DeviceAligner(
    shape_pos=sc.shape_pos, seed_size=sc.size, transition=True, step=1,
    sub_mat=sub, xdrop=910, hspthresh=1500, noentropy=False,
    chunk_size=CHUNK, device=accel[0])
al.set_ref(ref)
al.set_query(query, qrc)

it, pt = oracle.generate_seed_pos_table(ref, 1, sc.shape_pos, sc.size,
                                        sc.kmer_size)
seeds = oracle.extract_seed_offsets(query, 0, 0, CHUNK, sc.size,
                                    sc.shape_pos, True)
want, want_nh = oracle.seed_and_filter(
    seeds, it.astype(np.int64), pt, ref, query, sc.size, sub, 910,
    1500, False, al.max_hits)
want_arr = np.array([h.astuple() for h in want], np.int64).reshape(-1, 4)

got = al.seed_and_filter(0, CHUNK, rev=False)
assert got.num_hits == want_nh, (got.num_hits, want_nh)
np.testing.assert_array_equal(got.hsps, want_arr)
assert len(got.hsps) > 0
print("TPU_SMOKE_OK", len(got.hsps))
"""


def test_tpu_chunk_smoke():
    import jax
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    if not accel:
        pytest.skip("no accelerator device")

    env = dict(os.environ)
    env.pop("SEGALIGN_DEVICES", None)
    env.pop("XLA_FLAGS", None)
    # keep JAX_PLATFORMS as launched (the axon plugin needs its own value;
    # conftest only sets it when absent)
    if env.get("JAX_PLATFORMS") == "cpu":
        env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    # conftest strips the accelerator plugin path from PYTHONPATH so the
    # suite never touches the single-client tunnel; restore it for this
    # subprocess (it IS the on-hardware test).
    axon = env.pop("SEGALIGN_AXON_SITE", "")
    if axon:
        env["PYTHONPATH"] = env["PYTHONPATH"] + os.pathsep + axon
    if env.get("SEGALIGN_AXON_POOL_IPS"):
        # conftest scrubs the sitecustomize trigger; restore for this
        # subprocess so the plugin registers the real chip
        env["PALLAS_AXON_POOL_IPS"] = env.pop("SEGALIGN_AXON_POOL_IPS")
    r = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                       capture_output=True, text=True, timeout=1500)
    if r.returncode != 0:
        transient = ("ABORTED", "worker process crashed",
                     "Unable to initialize backend", "no accelerator")
        if any(t in r.stderr for t in transient):
            pytest.skip("TPU busy/unavailable (single-client tunnel): "
                        + r.stderr[-200:])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "TPU_SMOKE_OK" in r.stdout
