"""End-to-end per-chunk parity: DeviceAligner (JAX) vs the NumPy oracle."""

import numpy as np
import pytest

from segalign_tpu.config import make_seed_config, build_substitution_matrix
from segalign_tpu.io.blocks import chunk_interval
from segalign_tpu.oracle import reference as oracle
from segalign_tpu.pipeline.device import DeviceAligner


def make_pair(rng, n_ref=2200, n_query=2600, plant=True):
    ref = rng.integers(0, 4, n_ref).astype(np.uint8)
    query = rng.integers(0, 4, n_query).astype(np.uint8)
    if plant:
        core = rng.integers(0, 4, 400).astype(np.uint8)
        ref[300:700] = core
        query[500:900] = core
        # a diverged copy (5% mutations)
        mut = rng.random(400) < 0.05
        core2 = np.where(mut, (core + 1) % 4, core).astype(np.uint8)
        ref[1200:1600] = core2
        query[1500:1900] = core
        # soft-masked stretch and Ns
        ref[1000:1020] = 4
        query[100:110] = 5
    return ref, query


def oracle_chunk(ref, query, sc, sub, xdrop, hspthresh, chunk, max_hits,
                 it, pt, window=None, rm=False, rev=False):
    seeds = oracle.extract_seed_offsets(
        query, 0, chunk[0], chunk[1], sc.size, sc.shape_pos, sc.transition)
    if not seeds:
        return np.zeros((0, 4), np.int64), 0
    hsps, nh = oracle.seed_and_filter(
        seeds, it, pt, ref, query, sc.size, sub, xdrop, hspthresh,
        False, max_hits, window=window, rm_mode=rm, rev=rev)
    arr = np.array([h.astuple() for h in hsps], dtype=np.int64).reshape(-1, 4)
    return arr, nh


@pytest.mark.parametrize("max_hits", [10**9, 64])
def test_device_matches_oracle_pairwise(max_hits):
    rng = np.random.default_rng(42)
    sc = make_seed_config("12of19")
    xdrop, hspthresh = 910, 1500
    sub = build_substitution_matrix(xdrop)
    ref, query = make_pair(rng)

    it, pt = oracle.generate_seed_pos_table(
        ref, 1, sc.shape_pos, sc.size, sc.kmer_size)
    it = it.astype(np.int64)

    al = DeviceAligner(
        shape_pos=sc.shape_pos, seed_size=sc.size, transition=sc.transition,
        step=1, sub_mat=sub, xdrop=xdrop, hspthresh=hspthresh,
        noentropy=False, chunk_size=512, max_hits=max_hits, HBUF=1024,
        B=256, W=128)
    al.set_ref(ref)
    qrc = np.array([3, 2, 1, 0, 4, 5, 6, 7], np.uint8)[query[::-1]]
    al.set_query(query, qrc)

    # seed table matches the oracle's (host-resident under native seeding)
    got_it, got_pt = (al._host_tables if al.index_table is None
                      else (al.index_table, al.pos_table))
    np.testing.assert_array_equal(np.asarray(got_it), it)
    np.testing.assert_array_equal(np.asarray(got_pt), pt)

    q_len = len(query) - sc.size
    total_dev_hsps = 0
    for (cs, ce) in chunk_interval(0, q_len, 512):
        for rev in (False, True):
            qarr = qrc if rev else query
            want, want_nh = oracle_chunk(
                ref, qarr, sc, sub, xdrop, hspthresh, (cs, ce), max_hits,
                it, pt)
            got = al.seed_and_filter(cs, ce, rev)
            assert got.num_hits == want_nh, (cs, ce, rev)
            np.testing.assert_array_equal(got.hsps, want,
                                          err_msg=f"{cs}:{ce} rev={rev}")
            total_dev_hsps += len(got.hsps)
    assert total_dev_hsps > 0  # the test actually exercised HSPs


def test_device_matches_oracle_rm():
    rng = np.random.default_rng(7)
    sc = make_seed_config("12of19")
    xdrop, hspthresh = 910, 1500
    sub = build_substitution_matrix(xdrop)
    # self-alignment: block with internal repeats
    seq = rng.integers(0, 4, 1500).astype(np.uint8)
    core = rng.integers(0, 4, 300).astype(np.uint8)
    seq[100:400] = core
    seq[800:1100] = core
    rc = np.array([3, 2, 1, 0, 4, 5, 6, 7], np.uint8)[seq[::-1]]

    it, pt = oracle.generate_seed_pos_table(
        seq, 1, sc.shape_pos, sc.size, sc.kmer_size)
    it = it.astype(np.int64)

    al = DeviceAligner(
        shape_pos=sc.shape_pos, seed_size=sc.size, transition=sc.transition,
        step=1, sub_mat=sub, xdrop=xdrop, hspthresh=hspthresh,
        noentropy=False, chunk_size=512, max_hits=10**9, HBUF=1024,
        B=256, W=128, rm_mode=True)
    al.set_ref(seq)
    al.set_query(seq, rc)

    window = (200, 1200)
    got_any = 0
    for (cs, ce) in chunk_interval(0, len(seq) - sc.size, 512):
        for rev in (False, True):
            qarr = rc if rev else seq
            want, want_nh = oracle_chunk(
                seq, qarr, sc, sub, xdrop, hspthresh, (cs, ce), 10**9,
                it, pt, window=window, rm=True, rev=rev)
            got = al.seed_and_filter(cs, ce, rev, window=window)
            assert got.num_hits == want_nh
            np.testing.assert_array_equal(got.hsps, want,
                                          err_msg=f"{cs}:{ce} rev={rev}")
            got_any += len(got.hsps)
    assert got_any > 0


@pytest.mark.parametrize("seed", [1003, 1006, 1008, 1010])
def test_fuzz_parity_subset(seed):
    """CI-speed slice of the randomized parity fuzz (scripts/fuzz_oracle
    .py): random genome structure x random (shape, xdrop, hspthresh,
    max_hits, chunk, rm-window, noentropy) against the oracle. The
    chosen seeds cover RM windows, max_hits batching, 14of22, and
    noentropy."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "fuzz_oracle", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "fuzz_oracle.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    print(mod.run_case(seed))
