"""v2 k-mer-sharded seed table: exact parity vs the replicated path.

Runs the full sharded chunk program (seeding -> all_to_all routing ->
shard-local expansion -> extension -> all_gather) on the virtual 8-device
CPU mesh and asserts the final HSPs equal DeviceAligner's replicated-path
output for the same chunks. Reference seam transcended: per-GPU table
replication at /root/reference/common/seed_pos_table.cu:33-47.
"""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from segalign_tpu.config import make_seed_config, build_substitution_matrix
from segalign_tpu.index.seed_table import build_seed_table
from segalign_tpu.io.blocks import chunk_interval
from segalign_tpu.ops.extend import pad_sequence
from segalign_tpu.parallel.sharded import (shard_seed_table,
                                           make_sharded_extender,
                                           finalize_sharded)
from segalign_tpu.pipeline.device import DeviceAligner

RC = np.array([3, 2, 1, 0, 4, 5, 6, 7], np.uint8)
S = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices("cpu")
    if len(devs) < S:
        pytest.skip(f"need {S} cpu devices")
    return Mesh(np.array(devs[:S]), axis_names=("shard",))


def test_sharded_matches_replicated(mesh):
    rng = np.random.default_rng(17)
    sc = make_seed_config("12of19")
    xdrop, hspthresh = 910, 1500
    sub = build_substitution_matrix(xdrop)
    n = 4000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 700).astype(np.uint8)
    ref[500:1200] = core
    query[900:1600] = core
    mut = rng.random(700) < 0.06
    query[2500:3200] = np.where(mut, (core + 1) % 4, core).astype(np.uint8)
    ref[3000:3010] = 4  # soft-masked stretch
    qrc = RC[query[::-1]]

    it, pt = build_seed_table(ref, 1, sc.shape_pos, sc.size, sc.kmer_size)
    index_shards, pos_shards = shard_seed_table(it, pt, S)
    # sanity: shards tile the table exactly
    assert index_shards.shape == (S, 4 ** sc.kmer_size // S)
    recon = (index_shards.astype(np.int64)
             + np.concatenate([[0], np.asarray(it, np.int64)[
                 4 ** sc.kmer_size // S - 1::4 ** sc.kmer_size // S]])[
                 :-1, None]).reshape(-1)
    np.testing.assert_array_equal(recon, np.asarray(it, np.int64))

    CHUNK = 512
    pad = 512
    ext = make_sharded_extender(
        mesh, n_shards=S, kmer_size=sc.kmer_size, seed_size=sc.size,
        shape_pos=sc.shape_pos, transition=sc.transition, chunk_cap=CHUNK,
        pad=pad, W=128, xdrop=xdrop, hspthresh=hspthresh,
        CAP=2048, HCAP=4096, CCAP=2048)

    # replicated path (single device, oracle-verified elsewhere)
    al = DeviceAligner(
        shape_pos=sc.shape_pos, seed_size=sc.size, transition=sc.transition,
        step=1, sub_mat=sub, xdrop=xdrop, hspthresh=hspthresh,
        noentropy=False, chunk_size=CHUNK, max_hits=10**9, HBUF=4096,
        B=256, W=128)
    al.set_ref(ref)
    al.set_query(query, qrc)

    ref_pad = pad_sequence(ref, pad)
    sub_flat = np.ascontiguousarray(sub.reshape(-1), np.int32)

    total_hsps = 0
    for rev in (False, True):
        qarr = qrc if rev else query
        q_pad = pad_sequence(qarr, pad)
        for (cs, ce) in chunk_interval(0, n - sc.size, CHUNK):
            want = al.seed_and_filter(cs, ce, rev)
            th, ns, counts, packed, ovf = jax.device_get(ext(
                ref_pad, q_pad, index_shards, pos_shards, sub_flat,
                np.int32(cs), np.int32(ce - cs), np.int32(n), np.int32(n),
                np.int32(10**9), np.int32(0), np.int32(1 << 30)))
            assert int(ovf) == 0
            assert int(th) == want.num_hits, (cs, ce, rev)
            assert int(ns) == want.num_seeds, (cs, ce, rev)
            got = finalize_sharded(counts, packed, hspthresh,
                                   noentropy=False)
            np.testing.assert_array_equal(
                got, want.hsps, err_msg=f"{cs}:{ce} rev={rev}")
            total_hsps += len(got)
    assert total_hsps > 0


def test_sharded_overflow_detected(mesh):
    """Tiny CAP must raise the overflow flag, not silently truncate."""
    rng = np.random.default_rng(3)
    sc = make_seed_config("12of19")
    sub = build_substitution_matrix(910)
    n = 2000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = ref.copy()  # self-identity: dense hits
    it, pt = build_seed_table(ref, 1, sc.shape_pos, sc.size, sc.kmer_size)
    index_shards, pos_shards = shard_seed_table(it, pt, S)
    ext = make_sharded_extender(
        mesh, n_shards=S, kmer_size=sc.kmer_size, seed_size=sc.size,
        shape_pos=sc.shape_pos, transition=sc.transition, chunk_cap=512,
        pad=512, W=128, xdrop=910, hspthresh=1500,
        CAP=8, HCAP=4096, CCAP=2048)
    _, _, _, _, ovf = jax.device_get(ext(
        pad_sequence(ref, 512), pad_sequence(query, 512), index_shards,
        pos_shards, np.ascontiguousarray(sub.reshape(-1), np.int32),
        np.int32(0), np.int32(512), np.int32(n), np.int32(n),
        np.int32(10**9), np.int32(0), np.int32(1 << 30)))
    assert int(ovf) > 0
