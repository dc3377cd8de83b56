"""Tall-layout scan kernels + 2-D sequence padding.

Two things live here (both shared with the production row engine):

  - pad_sequence_2d — the (rows, 128) host padding layout whose
    reshape(-1) is the 1-D padded sequence every engine gathers from.
  - window_scan_tall — the carried-state continuation window step in the
    dense (B*W/128, 128) layout (default; SEGALIGN_TSTEP=0 restores the
    wide kernel), with the pass-count tricks learned on hardware: lane
    prefix sums as ONE triangular bf16 MXU matmul (exact for |score| <=
    123 with f32 accumulation), first-drop via min-reduce instead of a
    cumulative-OR scan, mirrored left-direction scans in place of data
    reversal. Semantics identical to extend3's XLA step (oracle-anchored,
    /root/reference/src/seed_filter.cu:232-652 tile-32 re-expression).

The tile-shared FIRST-window engine that originated this file (one ref
tile + one query tile DMA per group of BR planned hits, MXU one-hot
window extraction) was retired in round 5: despite the faster isolated
kernel (116 vs ~200 ns/hit), the integrated flow measured 27% slower
than the row engine on the repeat-structured bench after every
integration fix (see docs/DESIGN.md round-5 "tiled engine retired" for
the numbers; the kernel survives in git history).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2**31) + 1

# Static tile geometry. TR/TQ rows of 128 bytes per tile; a group's hits
# must satisfy max(start) - min(start) <= cap so every window fits its
# group's tiles (planner-enforced).
DEF_BR = 256        # hits per group (= per grid step)
DEF_TROWS = 256     # tile rows (32 KB)


def pad_sequence_2d(codes: np.ndarray, pad: int, trows: int, W: int,
                    extra_right: int = 0, fill: int = 6) -> np.ndarray:
    """Pad like ops/extend.pad_sequence but return a (rows, 128) uint8
    view whose right padding covers any group tile: trows*128 extra bytes
    beyond the last window end (plus any extra_right the other engines
    need). reshape(-1) of the device array is the 1-D padded sequence
    (same memory layout), so the continuation path's row gathers read the
    same buffer."""
    n = len(codes)
    total = pad + n + max(pad, extra_right) + 2 * W + trows * 128
    total = -(-total // 1024) * 1024
    out = np.full(total, fill, np.uint8)
    out[pad:pad + n] = codes
    return out.reshape(-1, 128)


def _lane_prefix_mm(sc, bwd: bool):
    """Inclusive lane-axis prefix sum via ONE MXU matmul with a
    triangular ones matrix (replaces 9 log-step roll passes). Exact:
    substitution scores are in [-123, 91] (bf16-exact ints) and window
    sums stay far below 2^24 with exact f32 accumulation."""
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = ((r >= c) if bwd else (r <= c)).astype(jnp.bfloat16)
    return jnp.dot(sc.astype(jnp.bfloat16), tri,
                   preferred_element_type=jnp.float32).astype(jnp.int32)


def _lane_bcast(x, lane_idx: int):
    """(N, 128) -> every lane holds x[:, lane_idx] (one lane gather)."""
    idx = jnp.full(x.shape, lane_idx, jnp.int32)
    return jnp.take_along_axis(x, idx, axis=1)


def _hit_rows(x, G2: int):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % G2


def _hit_row_incl(x, G2: int, op, unit, bwd: bool):
    """Inclusive within-hit combine along rows (each hit = G2 consecutive
    rows of a dense (N, 128) array); log-step sublane rolls masked at hit
    boundaries."""
    g = _hit_rows(x, G2)
    N = x.shape[0]
    k = 1
    while k < G2:
        if bwd:
            sh = pltpu.roll(x, N - k, 0)
            x = op(x, jnp.where(g < G2 - k, sh, unit))
        else:
            sh = pltpu.roll(x, k, 0)
            x = op(x, jnp.where(g >= k, sh, unit))
        k *= 2
    return x


def _hit_row_excl(inc, G2: int, unit, bwd: bool):
    """Inclusive within-hit row combine -> exclusive (shift one row)."""
    g = _hit_rows(inc, G2)
    N = inc.shape[0]
    if bwd:
        sh = pltpu.roll(inc, N - 1, 0)
        return jnp.where(g < G2 - 1, sh, unit)
    sh = pltpu.roll(inc, 1, 0)
    return jnp.where(g >= 1, sh, unit)


def _hit_cumsum(sc, G2: int, bwd: bool):
    """Inclusive within-hit prefix (bwd: suffix) sum over the flat
    (row, lane) position order of a dense (N, 128) array."""
    c = _lane_prefix_mm(sc, bwd)
    tot = _lane_bcast(c, 0 if bwd else 127)
    inc = _hit_row_incl(tot, G2, jnp.add, 0, bwd)
    return c + _hit_row_excl(inc, G2, 0, bwd)


def _hit_cummax(x, G2: int, bwd: bool):
    from .extend_pallas import _lane_cummax, _lane_rcummax
    m = (_lane_rcummax if bwd else _lane_cummax)(x, 128)
    tot = _lane_bcast(m, 0 if bwd else 127)
    inc = _hit_row_incl(tot, G2, jnp.maximum, NEG, bwd)
    return jnp.maximum(m, _hit_row_excl(inc, G2, NEG, bwd))


def _hit_bcast(s, BR: int, G2: int):
    """(BR, 1) per-hit scalar -> dense (BR*G2, 128)."""
    b2 = jnp.broadcast_to(s, (BR, 128))
    b3 = jnp.broadcast_to(b2[:, None, :], (BR, G2, 128))
    return b3.reshape(BR * G2, 128)


def _lookup_scores_tall(idx, sub_ref, N):
    tb = jnp.broadcast_to(sub_ref[:1, :], (N, 128))
    return jnp.take_along_axis(tb, idx, axis=1)


# ---------------------------------------------------------------------------
# Continuation window step in the dense tall layout.
#
# The generic carried-state window step (extend3._extension_window_step_lean
# semantics, oracle-anchored) re-expressed over (B*Gc, 128) rows: the
# (B, W) wide gather output reshapes to this layout FOR FREE (row-major),
# and the scan then runs with the same pass-count tricks as the first
# -window kernel: one MXU triangular matmul for the prefix sum, first-drop
# via reduce instead of a cumulative-OR scan, per-base packed count
# reduces. The LEFT direction scans mirrored (descending storage order)
# instead of reversing the gathered windows.


def _cont_hit_reduce(x, B, Gc, op, unit, lane_op, bwd):
    """Per-hit scalar over a (B*Gc, 128) single-direction block."""
    inc = _hit_row_incl(x, Gc, op, unit, bwd=False)
    x3 = inc.reshape(B, Gc, 128)
    return lane_op(x3[:, Gc - 1, :], axis=1, keepdims=True)


def _window_scan_tall_kernel(r_ref, q_ref, lr_ref, lq_ref, cum_ref,
                             maxv_ref, maxp_ref, done_ref, counts_ref,
                             cdel_ref, sub_ref, misc_ref, o_done, o_cum,
                             o_maxv, o_maxp, o_counts, o_cdel, *, W: int,
                             BRS: int, left: bool,
                             with_counts: bool = True):
    Gc = W // 128
    N = BRS * Gc
    xdrop = misc_ref[0]
    tile = misc_ref[1]
    ref_len = misc_ref[2]
    query_len = misc_ref[3]
    INF = 1 << 30

    rows_r = r_ref[:]                     # (N, 128) int32 window codes
    rows_q = q_ref[:]
    lr = lr_ref[:]                        # (BRS, 1)
    lq = lq_ref[:]
    done0 = done_ref[:] != 0
    alive = jnp.logical_not(done0)
    cum0 = cum_ref[:]
    maxv0 = maxv_ref[:]
    maxp0 = maxp_ref[:]

    hb = lambda s: _hit_bcast(s, BRS, Gc)
    rowg = _hit_rows(rows_r, Gc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
    f = rowg * 128 + lane                 # storage index within window
    # extension offset: right p = tile + f (storage == scan order);
    # left windows hold bytes [loc-tile-W, loc-tile) ascending, so scan
    # order is DESCENDING f and p = tile + W - f
    p = (tile + W - f) if left else (tile + f)
    lrb = hb(lr)
    lqb = hb(lq)
    if left:
        inb = (lrb >= p) & (lqb >= p)
    else:
        inb = ((lrb + p) < ref_len) & ((lqb + p) < query_len)

    sc = jnp.where(inb, _lookup_scores_tall(rows_r * 8 + rows_q, sub_ref,
                                            N), 0)
    cum = _hit_cumsum(sc, Gc, bwd=left) + hb(cum0)
    runmax = _hit_cummax(cum, Gc, bwd=left)
    m = jnp.maximum(hb(maxv0), runmax)
    drop = (m - cum) > xdrop
    fd = _cont_hit_reduce(jnp.where(drop, p, INF), BRS, Gc, jnp.minimum,
                          INF, jnp.min, left)
    anydrop = fd < INF
    before = p < hb(fd)
    best_in = _cont_hit_reduce(jnp.where(before, cum, NEG), BRS, Gc,
                               jnp.maximum, NEG, jnp.max, left)
    Mv = jnp.maximum(maxv0, best_in)
    is_new = Mv > maxv0
    hit = (cum == hb(Mv)) & before
    pmin = _cont_hit_reduce(jnp.where(hit, p, INF), BRS, Gc, jnp.minimum,
                            INF, jnp.min, left)
    Mp = jnp.where(is_new, pmin, maxp0)

    if left:
        edge = (lr < tile + W) | (lq < tile + W)
    else:
        edge = ((lr + tile + (W - 1)) >= ref_len) \
            | ((lq + tile + (W - 1)) >= query_len)
    finish = anydrop | edge

    counts0 = counts_ref[:]
    cdel0 = cdel_ref[:]
    if with_counts:
        new_max = Mp > maxp0
        counts_f = jnp.where(new_max, counts0 + cdel0, counts0)
        cdel_f = jnp.where(new_max, 0, cdel0)
        match = inb & (rows_r == rows_q) & (rows_r < 4)
        in_ext = p <= hb(Mp)
        add_in = []
        add_out = []
        for c in range(4):
            mc = match & (rows_r == c)
            v = jnp.where(mc, jnp.where(in_ext, 1, 1 << 16), 0)
            s = _cont_hit_reduce(v, BRS, Gc, jnp.add, 0, jnp.sum, left)
            add_in.append(jnp.bitwise_and(s, 0xFFFF))
            add_out.append(jnp.right_shift(s, 16))
        counts_f = counts_f + jnp.concatenate(add_in, axis=1)
        cdel_f = cdel_f + jnp.concatenate(add_out, axis=1)
    else:
        # lazy entropy: counts state passes through unchanged
        counts_f, cdel_f = counts0, cdel0

    cum3 = cum.reshape(BRS, Gc, 128)
    last = (cum3[:, 0, :][:, 0:1] if left
            else cum3[:, Gc - 1, :][:, 127:128])
    o_done[:] = (done0 | (alive & finish)).astype(jnp.int32)
    o_cum[:] = jnp.where(alive, last, cum0)
    o_maxv[:] = jnp.where(alive, Mv, maxv0)
    o_maxp[:] = jnp.where(alive, Mp, maxp0)
    o_counts[:] = jnp.where(alive, counts_f, counts0)
    o_cdel[:] = jnp.where(alive, cdel_f, cdel0)


@functools.partial(jax.jit,
                   static_argnames=("W", "left", "BRS", "interpret",
                                    "with_counts"))
def window_scan_tall(r, q, loc_r, loc_q, cum, maxv, maxp, done, counts,
                     cdel, sub_flat, xdrop, tile, ref_len, query_len, *,
                     W: int, left: bool, BRS: int = 256,
                     interpret: bool = False, with_counts: bool = True):
    """Drop-in replacement for extend_pallas.window_scan_pallas: r/q are
    the RAW (B, W) gathered windows (ascending bytes; NOT reversed for
    left — the kernel scans mirrored). Returns the six updated state
    arrays."""
    from .extend_pallas import _sub128
    B = r.shape[0]
    Gc = W // 128
    BRS = min(BRS, B)
    assert B % BRS == 0, (B, BRS)  # a remainder would leave rows unscanned
    misc = jnp.stack([jnp.int32(xdrop), jnp.int32(tile),
                      jnp.int32(ref_len), jnp.int32(query_len)])
    col = lambda a: a.reshape(B, 1)
    tall_spec = pl.BlockSpec((BRS * Gc, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((BRS, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    four_spec = pl.BlockSpec((BRS, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec((1, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    misc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_window_scan_tall_kernel, W=W, BRS=BRS,
                          left=left, with_counts=with_counts),
        grid=(B // BRS,),
        in_specs=[tall_spec, tall_spec, one_spec, one_spec, one_spec,
                  one_spec, one_spec, one_spec, four_spec, four_spec,
                  sub_spec, misc_spec],
        out_specs=(one_spec, one_spec, one_spec, one_spec, four_spec,
                   four_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 4), jnp.int32),
            jax.ShapeDtypeStruct((B, 4), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(r.reshape(B * Gc, 128), q.reshape(B * Gc, 128), col(loc_r),
      col(loc_q), col(cum), col(maxv), col(maxp),
      col(done.astype(jnp.int32)), counts, cdel, _sub128(sub_flat), misc)

    o_done, o_cum, o_maxv, o_maxp, o_counts, o_cdel = out
    return (o_done.reshape(B) != 0, o_cum.reshape(B), o_maxv.reshape(B),
            o_maxp.reshape(B), o_counts, o_cdel)
