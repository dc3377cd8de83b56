"""Continuation-window compaction must not change results (B > CONT with a
few very long extensions)."""

import numpy as np
import jax.numpy as jnp

from segalign_tpu.config import build_substitution_matrix
from segalign_tpu.ops.extend import extend_hits, pad_sequence
from segalign_tpu.ops import extend3
from segalign_tpu.ops.extend3 import extend_hits_windowed


def test_compacted_continuation_matches_loop():
    assert extend3.CONT < 8192  # ensure the compacted path runs
    rng = np.random.default_rng(31)
    n = 60_000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    # one long high-identity repeat: extensions cross many 512 windows
    core = rng.integers(0, 4, 20_000).astype(np.uint8)
    ref[5_000:25_000] = core
    query[30_000:50_000] = core

    pad = 512
    sub_flat = jnp.asarray(
        build_substitution_matrix(910).reshape(-1).astype(np.int32))
    ref_pad = jnp.asarray(pad_sequence(ref, pad))
    query_pad = jnp.asarray(pad_sequence(query, pad))

    B = 8192
    rl = rng.integers(0, n, B).astype(np.int32)
    ql = rng.integers(0, n, B).astype(np.int32)
    # a handful of in-repeat anchors (deep continuation, few live rows)
    d = 100
    off = rng.integers(100, 19_000, d).astype(np.int32)
    rl[:d] = 5_000 + off
    ql[:d] = 30_000 + off
    valid = np.ones(B, bool)
    valid[::37] = False

    a = extend_hits(ref_pad, query_pad, jnp.asarray(rl), jnp.asarray(ql),
                    jnp.asarray(valid), sub_flat, 910, 3000, n, n,
                    pad=pad, W=128)
    b = extend_hits_windowed(
        ref_pad, query_pad, jnp.asarray(rl), jnp.asarray(ql),
        jnp.asarray(valid), sub_flat, 910, 3000, n, n, pad=pad, W=pad)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    # the long-repeat rows really extended past many windows
    assert int(np.asarray(a["length"])[:d].max()) > 5_000
