"""Host-stepped windowed x-drop extension (production path).

The lax.while_loop formulation (ops/extend.py) produces multi-minute XLA
compiles on TPU; this variant keeps each device program dense and loop-free:
one jitted `window step` processes W positions for every live hit, and the
HOST advances windows until every hit has terminated (the first window
settles the overwhelming majority — a drop needs ~10 mismatches under
default scoring). Semantics are identical (tile-width independence,
oracle/scan_spec.py); entropy bookkeeping follows the reference's
fold-on-new-max rule per window.

TPU/axon practicalities baked into the structure:
  - no 1-D ops over >64k elements (reductions reshaped 2-D);
  - the two directions' first windows run in ONE program (counts are
    direction-separable: final counts = right counts + left counts);
  - continuation steps (rare) are separate cached programs with a single
    packed-scalar sync per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = jnp.int32(-(2**31) + 1)


def _sum1d(x, dtype=jnp.int32):
    """Reduce a long 1-D array without triggering the 1-D lowering cliff."""
    n = x.shape[0]
    if n <= 1 << 15:
        return jnp.sum(x, dtype=dtype)
    pad = (-n) % 512
    xp = jnp.pad(x.astype(dtype), (0, pad))
    return jnp.sum(xp.reshape(-1, 512), dtype=dtype)


def _window_body(seq_r_pad, seq_q_pad, loc_r, loc_q, k, st, sub_flat,
                 xdrop, ref_len, query_len, pad, W, left):
    """Window k for one direction. st = (done, cum, maxv, maxp, counts,
    cdel). Pure function used inside jitted wrappers."""
    done, cum, maxv, maxp, counts, cdel = st
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]
    tile = k * W
    alive = jnp.logical_not(done)

    if left:
        p = tile + 1 + lanes
        r = jax.vmap(lambda s: jax.lax.dynamic_slice(seq_r_pad, (s,), (W,))
                     )(pad + loc_r - tile - W).astype(jnp.int32)[:, ::-1]
        q = jax.vmap(lambda s: jax.lax.dynamic_slice(seq_q_pad, (s,), (W,))
                     )(pad + loc_q - tile - W).astype(jnp.int32)[:, ::-1]
        inb = (loc_r[:, None] >= p) & (loc_q[:, None] >= p)
        edge = (loc_r < tile + W) | (loc_q < tile + W)
    else:
        p = tile + lanes
        r = jax.vmap(lambda s: jax.lax.dynamic_slice(seq_r_pad, (s,), (W,))
                     )(pad + loc_r + tile).astype(jnp.int32)
        q = jax.vmap(lambda s: jax.lax.dynamic_slice(seq_q_pad, (s,), (W,))
                     )(pad + loc_q + tile).astype(jnp.int32)
        inb = ((loc_r[:, None] + p) < ref_len) & \
              ((loc_q[:, None] + p) < query_len)
        edge = (loc_r + tile + (W - 1) >= ref_len) | \
               (loc_q + tile + (W - 1) >= query_len)

    sc = jnp.where(inb, jnp.take(sub_flat, r * 8 + q), 0)
    cum_tile = jnp.cumsum(sc, axis=1, dtype=jnp.int32) + cum[:, None]
    run_max = jax.lax.cummax(cum_tile, axis=1)
    m = jnp.maximum(maxv[:, None], run_max)
    dropm = (m - cum_tile) > xdrop
    anydrop = jnp.any(dropm, axis=1)
    d = jnp.where(anydrop, jnp.argmax(dropm, axis=1).astype(jnp.int32), W)
    before = lanes < d[:, None]

    best_in_tile = jnp.max(jnp.where(before, cum_tile, NEG), axis=1)
    Mv = jnp.maximum(maxv, best_in_tile)
    is_new = Mv > maxv
    j = jnp.argmax((cum_tile == Mv[:, None]) & before, axis=1
                   ).astype(jnp.int32)
    if left:
        Mp = jnp.where(is_new, tile + 1 + j, maxp)
    else:
        Mp = jnp.where(is_new, tile + j, maxp)

    finish = anydrop | edge

    new_max_found = Mp > maxp
    counts_f = jnp.where(new_max_found[:, None], counts + cdel, counts)
    cdel_f = jnp.where(new_max_found[:, None], 0, cdel)
    match = inb & (r == q) & (r < 4)
    in_ext = p <= Mp[:, None]
    onehot = r[:, :, None] == jnp.arange(4, dtype=jnp.int32)[None, None, :]
    counts_f = counts_f + jnp.sum(
        (match & in_ext)[:, :, None] & onehot, axis=1, dtype=jnp.int32)
    cdel_f = cdel_f + jnp.sum(
        (match & ~in_ext)[:, :, None] & onehot, axis=1, dtype=jnp.int32)

    al2 = alive[:, None]
    return (done | (alive & finish),
            jnp.where(alive, cum_tile[:, -1], cum),
            jnp.where(alive, Mv, maxv),
            jnp.where(alive, Mp, maxp),
            jnp.where(al2, counts_f, counts),
            jnp.where(al2, cdel_f, cdel))


def _init_state(B, valid, init_maxp):
    z = jnp.zeros((B,), jnp.int32)
    zc = jnp.zeros((B, 4), jnp.int32)
    return (jnp.logical_not(valid), z, z,
            jnp.full((B,), init_maxp, jnp.int32), zc, zc)


@functools.partial(jax.jit, static_argnames=("pad", "W"))
def extension_first_windows(ref_pad, query_pad, ref_loc, query_loc, valid,
                            sub_flat, xdrop, ref_len, query_len, *,
                            pad: int, W: int):
    """Window 0 of BOTH directions in one program. Returns (state_r,
    state_l, packed alive counts (2,))."""
    B = ref_loc.shape[0]
    loc_r = jnp.where(valid, ref_loc.astype(jnp.int32), 0)
    loc_q = jnp.where(valid, query_loc.astype(jnp.int32), 0)
    st_r = _window_body(ref_pad, query_pad, loc_r, loc_q, 0,
                        _init_state(B, valid, -1), sub_flat, xdrop,
                        ref_len, query_len, pad, W, left=False)
    st_l = _window_body(ref_pad, query_pad, loc_r, loc_q, 0,
                        _init_state(B, valid, 0), sub_flat, xdrop,
                        ref_len, query_len, pad, W, left=True)
    alive = jnp.stack([_sum1d(jnp.logical_not(st_r[0])),
                       _sum1d(jnp.logical_not(st_l[0]))])
    return st_r, st_l, alive


@functools.partial(jax.jit, static_argnames=("pad", "W", "left"))
def extension_window_step(ref_pad, query_pad, ref_loc, query_loc, valid, k,
                          state, sub_flat, xdrop, ref_len, query_len, *,
                          pad: int, W: int, left: bool):
    """One continuation window for one direction (k >= 1)."""
    loc_r = jnp.where(valid, ref_loc.astype(jnp.int32), 0)
    loc_q = jnp.where(valid, query_loc.astype(jnp.int32), 0)
    st = _window_body(ref_pad, query_pad, loc_r, loc_q, k, state, sub_flat,
                      xdrop, ref_len, query_len, pad, W, left)
    return st, _sum1d(jnp.logical_not(st[0]))


def extension_finalize(valid, ref_loc, query_loc, st_r, st_l, hspthresh):
    """Combine direction states into hit results (plain ops; callers jit)."""
    loc_r = jnp.where(valid, ref_loc.astype(jnp.int32), 0)
    loc_q = jnp.where(valid, query_loc.astype(jnp.int32), 0)
    r_maxv, r_maxp = st_r[2], st_r[3]
    l_maxv, l_maxp = st_l[2], st_l[3]
    counts = st_r[4] + st_l[4]
    total = r_maxv + l_maxv
    return dict(
        candidate=valid & (total >= hspthresh),
        rs=jnp.where(valid, loc_r - l_maxp, 0),
        qs=jnp.where(valid, loc_q - l_maxp, 0),
        length=jnp.where(valid, r_maxp + l_maxp, -1),
        total=jnp.where(valid, total, 0),
        counts=jnp.where(valid[:, None], counts, 0))


def extend_hits_windowed(ref_pad, query_pad, ref_loc, query_loc, valid,
                         sub_flat, xdrop, hspthresh, ref_len, query_len, *,
                         pad: int, W: int = 512, max_windows: int = 1 << 20):
    """Host-driven extension over a hit batch. Same result contract as
    ops.extend.extend_hits (not jittable as a whole: host loop inside)."""
    st_r, st_l, alive = extension_first_windows(
        ref_pad, query_pad, ref_loc, query_loc, valid, sub_flat, xdrop,
        ref_len, query_len, pad=pad, W=W)
    alive = jax.device_get(alive)

    for left, st, n_alive in ((False, st_r, int(alive[0])),
                              (True, st_l, int(alive[1]))):
        k = 1
        while n_alive > 0 and k < max_windows:
            st, na = extension_window_step(
                ref_pad, query_pad, ref_loc, query_loc, valid, k, st,
                sub_flat, xdrop, ref_len, query_len, pad=pad, W=W,
                left=left)
            n_alive = int(na)
            k += 1
        if left:
            st_l = st
        else:
            st_r = st

    return jax.jit(extension_finalize)(valid, ref_loc, query_loc, st_r,
                                       st_l, hspthresh)
