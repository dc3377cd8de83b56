"""The host-stepped windowed extender must agree with the while-loop
extender exactly (same data as the two-phase test, plus multi-window
repeats)."""

import numpy as np
import jax.numpy as jnp

from segalign_tpu.config import build_substitution_matrix
from segalign_tpu.ops.extend import extend_hits, pad_sequence
from segalign_tpu.ops.extend3 import extend_hits_windowed


def test_windowed_matches_loop():
    rng = np.random.default_rng(21)
    n = 20_000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 3000).astype(np.uint8)
    ref[2000:5000] = core
    query[9000:12000] = core
    core2 = rng.integers(0, 4, 300).astype(np.uint8)
    ref[6000:6300] = core2
    query[500:800] = core2
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
    off = rng.integers(50, 2900, d).astype(np.int32)
    rl[:d] = 2000 + off
    ql[:d] = 9000 + off
    off2 = rng.integers(0, 280, d).astype(np.int32)
    rl[d:2 * d] = 6000 + off2
    ql[d:2 * d] = 500 + off2
    rl[2 * d:2 * d + 8] = np.array([0, 1, 5, 17, n - 1, n - 2, n - 40, 100])
    ql[2 * d:2 * d + 8] = np.array([3, 0, n - 1, 29, n - 3, 7, n - 41, 101])
    valid = rng.random(B) > 0.05

    for xdrop, hsp in ((910, 3000), (300, 1000)):
        a = extend_hits(ref_pad, query_pad, jnp.asarray(rl), jnp.asarray(ql),
                        jnp.asarray(valid), sub_flat, xdrop, hsp, n, n,
                        pad=pad, W=128)
        b = extend_hits_windowed(
            ref_pad, query_pad, jnp.asarray(rl), jnp.asarray(ql),
            jnp.asarray(valid), sub_flat, xdrop, hsp, n, n, pad=pad, W=pad)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
        assert np.asarray(a["candidate"]).sum() > 10
