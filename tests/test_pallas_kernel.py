"""Pallas window-scan kernel vs the XLA step (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from segalign_tpu.config import build_substitution_matrix
from segalign_tpu.ops.extend import extend_hits, pad_sequence
from segalign_tpu.ops import extend3


@pytest.fixture
def pallas_mode(monkeypatch):
    monkeypatch.setattr(extend3, "_USE_PALLAS", True)


def test_pallas_matches_loop(pallas_mode):
    rng = np.random.default_rng(41)
    n = 20_000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 2000).astype(np.uint8)
    ref[3000:5000] = core
    query[9000:11000] = core
    ref[15000] = 7
    query[15050] = 7

    pad = 512
    sub_flat = jnp.asarray(
        build_substitution_matrix(910).reshape(-1).astype(np.int32))
    ref_pad = jnp.asarray(pad_sequence(ref, pad))
    query_pad = jnp.asarray(pad_sequence(query, pad))

    B = 512
    rl = rng.integers(0, n, B).astype(np.int32)
    ql = rng.integers(0, n, B).astype(np.int32)
    d = B // 4
    off = rng.integers(50, 1900, d).astype(np.int32)
    rl[:d] = 3000 + off
    ql[:d] = 9000 + off
    rl[d:d + 8] = np.array([0, 1, 5, 17, n - 1, n - 2, n - 40, 100])
    ql[d:d + 8] = np.array([3, 0, n - 1, 29, n - 3, 7, n - 41, 101])
    valid = rng.random(B) > 0.05

    a = extend_hits(ref_pad, query_pad, jnp.asarray(rl), jnp.asarray(ql),
                    jnp.asarray(valid), sub_flat, 910, 3000, n, n,
                    pad=pad, W=128)
    b = extend3.extend_hits_windowed(
        ref_pad, query_pad, jnp.asarray(rl), jnp.asarray(ql),
        jnp.asarray(valid), sub_flat, 910, 3000, n, n, pad=pad, W=pad)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    assert np.asarray(a["candidate"]).sum() > 5
