"""On-hardware smoke test: one real chunk on the actual accelerator.

The rest of the suite runs on local CPU devices (fast local compiles); this
test keeps coverage of the real TPU path. Skipped when no accelerator is
available."""

import os

import numpy as np
import pytest


def test_tpu_chunk_smoke():
    import jax
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    if not accel:
        pytest.skip("no accelerator device")
    with jax.default_device(accel[0]):
        _run_smoke(accel)


def _run_smoke(accel):

    from segalign_tpu.config import make_seed_config, build_substitution_matrix
    from segalign_tpu.pipeline.device import DeviceAligner
    from segalign_tpu.oracle import reference as oracle

    rng = np.random.default_rng(3)
    sc = make_seed_config("12of19")
    sub = build_substitution_matrix(910)
    ref = rng.integers(0, 4, 3000).astype(np.uint8)
    query = rng.integers(0, 4, 3000).astype(np.uint8)
    core = rng.integers(0, 4, 500).astype(np.uint8)
    ref[1000:1500] = core
    query[200:700] = core
    qrc = np.array([3, 2, 1, 0, 4, 5, 6, 7], np.uint8)[query[::-1]]

    al = DeviceAligner(
        shape_pos=sc.shape_pos, seed_size=sc.size, transition=True, step=1,
        sub_mat=sub, xdrop=910, hspthresh=1500, noentropy=False,
        chunk_size=1024, HBUF=2048, device=accel[0])
    al.set_ref(ref)
    al.set_query(query, qrc)

    it, pt = oracle.generate_seed_pos_table(ref, 1, sc.shape_pos, sc.size,
                                            sc.kmer_size)
    seeds = oracle.extract_seed_offsets(query, 0, 0, 1024, sc.size,
                                        sc.shape_pos, True)
    want, want_nh = oracle.seed_and_filter(
        seeds, it.astype(np.int64), pt, ref, query, sc.size, sub, 910,
        1500, False, al.max_hits)
    want_arr = np.array([h.astuple() for h in want],
                        np.int64).reshape(-1, 4)

    got = al.seed_and_filter(0, 1024, rev=False)
    assert got.num_hits == want_nh
    np.testing.assert_array_equal(got.hsps, want_arr)
    assert len(got.hsps) > 0
