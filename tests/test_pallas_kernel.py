"""Pallas window-scan kernel vs the XLA step (interpret mode on CPU)."""

import numpy as np
import jax
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


def test_fused_program_pallas_engine_matches_xla():
    """extend_compact_program(engine='pallas') == engine='xla' bit-for-bit.

    The pallas engine (DMA row gather + fused scan kernel) is the TPU
    default; on CPU it runs in interpret mode, so keep shapes small."""
    from segalign_tpu.ops.extend_fused import extend_compact_program
    from segalign_tpu.ops.extend_pallas import AWIN

    rng = np.random.default_rng(43)
    n = 8_000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 1500).astype(np.uint8)
    ref[1000:2500] = core
    query[4000:5500] = core
    ref[6000] = 7

    pad = 256
    sub_flat = jnp.asarray(
        build_substitution_matrix(910).reshape(-1).astype(np.int32))
    ref_pad = jnp.asarray(pad_sequence(ref, pad, pad + AWIN))
    query_pad = jnp.asarray(pad_sequence(query, pad, pad + AWIN))

    B = 256
    rl = rng.integers(0, n, B).astype(np.int32)
    ql = rng.integers(0, n, B).astype(np.int32)
    d = B // 4
    off = rng.integers(50, 1400, d).astype(np.int32)
    rl[:d] = 1000 + off
    ql[:d] = 4000 + off
    rl[d:d + 6] = np.array([0, 1, 17, n - 1, n - 30, 5990])
    ql[d:d + 6] = np.array([3, 0, 29, n - 3, n - 31, 6010])
    m = B - 7  # a few padding rows

    outs = {}
    for engine in ("xla", "pallas_interpret"):
        n_c, packed = extend_compact_program(
            ref_pad, query_pad, jnp.asarray(rl), jnp.asarray(ql), m,
            sub_flat, 910, 1800, n, n, pad=pad, W=pad, CBUF=64,
            engine=engine)
        outs[engine] = (int(n_c), np.asarray(packed))
    assert outs["xla"][0] == outs["pallas_interpret"][0]
    assert outs["xla"][0] > 0
    k = min(outs["xla"][0], 64)
    np.testing.assert_array_equal(outs["xla"][1][:k],
                                  outs["pallas_interpret"][1][:k])


def test_mixed_continuation_width_is_exact():
    """W_CONT != W continuation yields identical results (window-width
    independence of the scan; continuation phases use wider windows on
    TPU to amortize loop overheads)."""
    from segalign_tpu.ops.extend_fused import extend_program

    rng = np.random.default_rng(44)
    n = 16_000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 6000).astype(np.uint8)
    ref[2000:8000] = core
    query[7000:13000] = core

    pad = 1024  # must cover W_CONT
    sub_flat = jnp.asarray(
        build_substitution_matrix(910).reshape(-1).astype(np.int32))
    ref_pad = jnp.asarray(pad_sequence(ref, pad))
    query_pad = jnp.asarray(pad_sequence(query, pad))

    B = 512
    rl = rng.integers(0, n, B).astype(np.int32)
    ql = rng.integers(0, n, B).astype(np.int32)
    d = B // 2
    off = rng.integers(50, 5900, d).astype(np.int32)
    rl[:d] = 2000 + off
    ql[:d] = 7000 + off
    valid = np.ones(B, bool)

    outs = []
    # CONT=128 < B forces the phase-2/3 compaction path
    for (w, wc, unroll) in ((128, 0, 1), (128, 512, 4), (128, 1024, 2)):
        res = extend_program(
            ref_pad, query_pad, jnp.asarray(rl), jnp.asarray(ql),
            jnp.asarray(valid), sub_flat, 910, 1800, n, n, pad=pad, W=w,
            CONT=128, W_CONT=wc, UNROLL=unroll)
        outs.append(jax.device_get(res))
    base = outs[0]
    assert np.asarray(base["candidate"]).sum() > 0
    for other in outs[1:]:
        for k in ("candidate", "rs", "qs", "length", "total", "counts"):
            np.testing.assert_array_equal(np.asarray(base[k]),
                                          np.asarray(other[k]), err_msg=k)


def test_qtile_gather_dispatch_parity():
    """The shared-tile q-side first-window gather (SEGALIGN_QTILE,
    pallas engines) must be bit-identical to the per-row gather through
    the full dispatcher, and must actually ENGAGE on dense query-sorted
    hits (span check passes)."""
    import os
    import numpy as np
    from segalign_tpu.config import make_seed_config
    from segalign_tpu.pipeline.device import DeviceAligner

    rng = np.random.default_rng(9)
    sc = make_seed_config("12of19")
    sub = build_substitution_matrix(910)
    n = 4000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 1200).astype(np.uint8)
    ref[500:1700] = core
    query[800:2000] = core
    qrc = np.array([3, 2, 1, 0, 4, 5, 6, 7], np.uint8)[query[::-1]]

    def run(qtile_env):
        old = os.environ.get("SEGALIGN_QTILE")
        os.environ["SEGALIGN_QTILE"] = qtile_env
        try:
            al = DeviceAligner(
                shape_pos=sc.shape_pos, seed_size=sc.size,
                transition=sc.transition, step=1, sub_mat=sub, xdrop=910,
                hspthresh=1500, noentropy=False, chunk_size=2048,
                max_hits=10**9, HBUF=4096, B=256, W=128,
                use_pallas=True)
            al.set_ref(ref)
            al.set_query(query, qrc)
            outs = []
            for rev in (False, True):
                outs.append(al.seed_and_filter(0, 2048, rev))
            return al, outs
        finally:
            if old is None:
                os.environ.pop("SEGALIGN_QTILE", None)
            else:
                os.environ["SEGALIGN_QTILE"] = old

    al_on, on = run("1")
    al_off, off = run("0")
    if al_on._native_seeder is None:
        import pytest
        pytest.skip("native seeder unavailable")
    assert al_on.qtile_programs > 0   # the tile path actually ran
    assert al_off.qtile_programs == 0
    for a, b in zip(on, off):
        assert a.num_hits == b.num_hits
        np.testing.assert_array_equal(a.hsps, b.hsps)
