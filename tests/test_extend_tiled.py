"""Tiled first-window engine parity: first_scan_tiled must reproduce the
wide first-window kernel (extend_fused._first_steps_pallas, itself
oracle-anchored) bit-for-bit on every state field, for every valid row,
including window-edge, sequence-edge, and x-drop terminations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segalign_tpu.config import make_seed_config, build_substitution_matrix
from segalign_tpu.ops.extend import pad_sequence
from segalign_tpu.ops.extend_fused import _first_steps_pallas
from segalign_tpu.ops.extend_tiled import (plan_tiled_groups,
                                           pad_sequence_2d,
                                           first_scan_tiled)

W = 512
PAD = 2048
XDROP = 910


def _mk_case(rng, n=6000, nhits=700):
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 2000).astype(np.uint8)
    ref[1000:3000] = core
    mut = rng.random(2000) < 0.08
    query[2500:4500] = np.where(mut, (core + 1) % 4, core).astype(np.uint8)
    ref[4000:4060] = 4  # soft-masked wall
    rl = rng.integers(0, n, nhits).astype(np.int32)
    ql = rng.integers(0, n, nhits).astype(np.int32)
    # planted on-diagonal hits through the homologous block (long
    # extensions, both directions)
    k = nhits // 4
    off = rng.integers(0, 2000, k).astype(np.int32)
    rl[:k] = 1000 + off
    ql[:k] = 2500 + off
    # edge hits
    rl[k:k + 8] = np.arange(8)
    ql[k:k + 8] = np.arange(8)
    rl[k + 8:k + 16] = n - 1 - np.arange(8)
    ql[k + 8:k + 16] = n - 1 - np.arange(8)
    return ref, query, rl, ql


def _wide_reference(ref, query, rl, ql, valid, sub_flat, n):
    """Wide-kernel first windows (interpret mode) on the same rows."""
    from segalign_tpu.ops.extend_pallas import awin_for
    B = len(rl)
    rp = jnp.asarray(pad_sequence(ref, PAD, PAD + awin_for(2 * W)))
    qp = jnp.asarray(pad_sequence(query, PAD, PAD + awin_for(2 * W)))
    z = jnp.zeros((B,), jnp.int32)

    def init_st(init_maxp):
        return dict(done=jnp.asarray(~valid), cum=z, maxv=z,
                    maxp=jnp.full((B,), init_maxp, jnp.int32),
                    counts=jnp.zeros((B, 4), jnp.int32),
                    cdel=jnp.zeros((B, 4), jnp.int32))

    (st_r, _), (st_l, _) = _first_steps_pallas(
        rp, qp, jnp.asarray(rl), jnp.asarray(ql), init_st(-1), init_st(0),
        jnp.asarray(sub_flat), XDROP, n, n, pad=PAD, W=W, interpret=True)
    return st_r, st_l


@pytest.mark.parametrize("seed", [0, 7])
def test_tiled_first_window_parity(seed):
    rng = np.random.default_rng(seed)
    n = 6000
    ref, query, rl, ql = _mk_case(rng, n=n)
    sub = build_substitution_matrix(XDROP)
    sub_flat = np.ascontiguousarray(sub.reshape(-1), np.int32)

    plan = plan_tiled_groups(rl, ql, W=W, pad=PAD, BR=64, trows=256,
                             qbucket=4096)
    ref2d = jnp.asarray(pad_sequence_2d(ref, PAD, 256, W))
    q2d = jnp.asarray(pad_sequence_2d(query, PAD, 256, W))

    st_r, st_l = first_scan_tiled(
        ref2d, q2d, jnp.asarray(plan["rbase"]), jnp.asarray(plan["qbase"]),
        jnp.asarray(plan["rl"]), jnp.asarray(plan["ql"]),
        jnp.asarray(plan["valid"]), jnp.asarray(sub_flat), XDROP, n, n,
        W=W, pad=PAD, BR=64, TR=256, TQ=256, interpret=True)

    want_r, want_l = _wide_reference(ref, query, plan["rl"], plan["ql"],
                                     plan["valid"], sub_flat, n)
    v = plan["valid"]
    assert v.sum() == len(rl)
    for name, got, want in (("right", st_r, want_r), ("left", st_l,
                                                      want_l)):
        for k in ("done", "cum", "maxv", "maxp", "counts", "cdel"):
            g = np.asarray(got[k])
            w = np.asarray(want[k])
            np.testing.assert_array_equal(
                g[v], w[v], err_msg=f"{name}.{k} seed={seed}")
    # sanity: planted hits actually extended (not all-zero comparison)
    assert int(np.asarray(st_r["maxv"])[v].max()) > 500
    assert int(np.asarray(st_l["maxv"])[v].max()) > 500
    # long planted extensions must survive the first window (the
    # continuation path is exercised downstream), background must die
    done = np.asarray(st_r["done"])[v]
    assert not done.all() and done.any()


def test_plan_covers_all_hits():
    rng = np.random.default_rng(3)
    rl = rng.integers(0, 10**6, 5000).astype(np.int32)
    ql = rng.integers(0, 250_000, 5000).astype(np.int32)
    plan = plan_tiled_groups(rl, ql, W=W, pad=PAD)
    v = plan["valid"]
    assert v.sum() == 5000
    # orig is a permutation of the valid rows
    assert np.array_equal(np.sort(plan["orig"][v]), np.arange(5000))
    # every window stays inside its group tiles
    BR = 256
    for g in range(plan["ngroups"]):
        rows = slice(g * BR, (g + 1) * BR)
        rs = plan["rl"][rows].astype(np.int64) + PAD - W
        qs = plan["ql"][rows].astype(np.int64) + PAD - W
        assert (rs - plan["rbase"][g] * 128 >= 0).all()
        assert (rs - plan["rbase"][g] * 128 + 2 * W <= 256 * 128).all()
        assert (qs - plan["qbase"][g] * 128 >= 0).all()
        assert (qs - plan["qbase"][g] * 128 + 2 * W <= 256 * 128).all()
