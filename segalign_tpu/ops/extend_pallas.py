"""Pallas TPU kernel for the windowed x-drop extension scan.

Replaces the ~30-kernel XLA program of extension_window_step's compute with
ONE fused kernel: per grid step a (BR, W) block of hits' window scores is
scanned entirely in VMEM (cumulative sum, running max with earliest-pos
tie-break, first-drop detection, entropy match counting) using lane-axis
log-step shifts. The window gathers stay in XLA (they are fast and fuse
poorly into Pallas anyway); everything after the gather is this kernel.

Semantics are identical to ops/extend3._window_body (itself equivalent to
the reference CUDA tile-32 algorithm; see oracle/scan_spec.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2**31) + 1  # plain int: jnp scalars would be captured consts in the kernel


def _lane_cumsum(x, W):
    """Inclusive cumsum along the lane axis via log-step shifts."""
    k = 1
    while k < W:
        shifted = pltpu.roll(x, k, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = x + jnp.where(lane >= k, shifted, 0)
        k *= 2
    return x


def _lane_cummax(x, W):
    k = 1
    while k < W:
        shifted = pltpu.roll(x, k, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.maximum(x, jnp.where(lane >= k, shifted, NEG))
        k *= 2
    return x


def _lane_cumor(x_bool, W):
    # Mosaic cannot rotate i1 vectors; run the OR-scan as an i32 max-scan
    x = x_bool.astype(jnp.int32)
    k = 1
    while k < W:
        shifted = pltpu.roll(x, k, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.maximum(x, jnp.where(lane >= k, shifted, 0))
        k *= 2
    return x > 0


# Mirrored (right-to-left) scans: equivalent to reversing the lanes,
# running the forward scan, and reversing back — without the reversals.
# roll(x, W - k) is the circular equivalent of roll(x, -k).

def _lane_rcumsum(x, W):
    k = 1
    while k < W:
        shifted = pltpu.roll(x, W - k, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = x + jnp.where(lane < W - k, shifted, 0)
        k *= 2
    return x


def _lane_rcummax(x, W):
    k = 1
    while k < W:
        shifted = pltpu.roll(x, W - k, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.maximum(x, jnp.where(lane < W - k, shifted, NEG))
        k *= 2
    return x


def _lane_rcumor(x_bool, W):
    x = x_bool.astype(jnp.int32)
    k = 1
    while k < W:
        shifted = pltpu.roll(x, W - k, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.maximum(x, jnp.where(lane < W - k, shifted, 0))
        k *= 2
    return x > 0


def _lookup_scores(idx, sub_ref, BR, W):
    """Per-lane substitution lookup via tpu.dynamic_gather (one gather per
    128-lane group). The source must span exactly one vreg of lanes."""
    if W % 128 == 0:
        tb = jnp.broadcast_to(sub_ref[:1, :], (BR, 128))
        return jnp.concatenate(
            [jnp.take_along_axis(tb, idx[:, c * 128:(c + 1) * 128], axis=1)
             for c in range(W // 128)], axis=1)
    # fallback for non-vreg-multiple widths (unused in production)
    sc = jnp.zeros((BR, W), jnp.int32)
    for e in range(64):
        sc = sc + jnp.where(idx == e, sub_ref[0, e], 0)
    return sc


def _window_scan_kernel(r_ref, q_ref, lr_ref, lq_ref, cum_ref, maxv_ref,
                        maxp_ref, done_ref, counts_ref, cdel_ref, sub_ref,
                        misc_ref, o_cum_ref, o_maxv_ref, o_maxp_ref,
                        o_done_ref, o_counts_ref, o_cdel_ref, *, W: int,
                        left: bool, with_counts: bool = True):
    xdrop = misc_ref[0]
    tile = misc_ref[1]
    ref_len = misc_ref[2]
    query_len = misc_ref[3]

    r = r_ref[:]
    q = q_ref[:]
    lr = lr_ref[:]  # (BR, 1) anchor locations: in-bounds masks are
    lq = lq_ref[:]  # computed here, not materialized as (B, W) inputs
    BR = r.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)
    if left:
        p = tile + 1 + lanes
        inb = (lr >= p) & (lq >= p)
    else:
        p = tile + lanes
        inb = ((lr + p) < ref_len) & ((lq + p) < query_len)

    done_in = done_ref[:] != 0
    alive = jnp.logical_not(done_in)
    cum0 = cum_ref[:]
    maxv0 = maxv_ref[:]
    maxp0 = maxp_ref[:]

    # score lookup: per-lane dynamic_gather from the 64-entry substitution
    # table. The previous 64-iteration select loop was ~192 VPU ops/cell
    # and dominated the whole kernel's compute.
    sc = _lookup_scores(r * 8 + q, sub_ref, BR, W)
    sc = jnp.where(inb, sc, 0)

    cum = _lane_cumsum(sc, W) + cum0[:, :1]
    runmax = _lane_cummax(cum, W)
    m = jnp.maximum(maxv0[:, :1], runmax)
    drop = (m - cum) > xdrop
    dropc = _lane_cumor(drop, W)
    anydrop = dropc[:, W - 1:W]
    # lane < first-drop-lane: the inclusive OR marks the drop lane itself,
    # so its negation matches `lanes < d` exactly
    before = jnp.logical_not(dropc)

    best_in = jnp.max(jnp.where(before, cum, NEG), axis=1, keepdims=True)
    Mv = jnp.maximum(maxv0[:, :1], best_in)
    is_new = Mv > maxv0[:, :1]
    hit = (cum == Mv) & before
    # earliest lane achieving the new max
    j = jnp.min(jnp.where(hit, lanes, W), axis=1, keepdims=True)
    if left:
        Mp = jnp.where(is_new, tile + 1 + j, maxp0[:, :1])
    else:
        Mp = jnp.where(is_new, tile + j, maxp0[:, :1])

    # edge: last lane of the window out of bounds
    edge = jnp.logical_not(inb[:, W - 1:W])
    finish = anydrop | edge

    counts0 = counts_ref[:]
    cdel0 = cdel_ref[:]
    if with_counts:
        new_max = Mp > maxp0[:, :1]
        counts_f = jnp.where(new_max, counts0 + cdel0, counts0)
        cdel_f = jnp.where(new_max, 0, cdel0)
        match = inb & (r == q) & (r < 4)
        in_ext = p <= Mp
        add_in = []
        add_out = []
        for c in range(4):
            mc = match & (r == c)
            add_in.append(jnp.sum(mc & in_ext, axis=1, keepdims=True,
                                  dtype=jnp.int32))
            add_out.append(jnp.sum(mc & jnp.logical_not(in_ext), axis=1,
                                   keepdims=True, dtype=jnp.int32))
        counts_f = counts_f + jnp.concatenate(add_in, axis=1)
        cdel_f = cdel_f + jnp.concatenate(add_out, axis=1)
    else:
        # lazy entropy: state passes through unchanged (the host
        # recomputes counts from final extents; oracle/scan_spec.py)
        counts_f, cdel_f = counts0, cdel0

    al = alive[:, :1]
    o_done_ref[:] = (done_in | (al & finish)).astype(jnp.int32)
    o_cum_ref[:] = jnp.where(al, cum[:, W - 1:W], cum0[:, :1])
    o_maxv_ref[:] = jnp.where(al, Mv, maxv0[:, :1])
    o_maxp_ref[:] = jnp.where(al, Mp, maxp0[:, :1])
    o_counts_ref[:] = jnp.where(al, counts_f, counts0)
    o_cdel_ref[:] = jnp.where(al, cdel_f, cdel0)


def _sub128(sub_flat):
    """Pad the 64-entry table to one full vreg of lanes (dynamic_gather
    source)."""
    return jnp.concatenate(
        [sub_flat.reshape(1, 64),
         jnp.zeros((1, 64), sub_flat.dtype)], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("W", "left", "BR", "interpret",
                                    "with_counts"))
def window_scan_pallas(r, q, loc_r, loc_q, cum, maxv, maxp, done, counts,
                       cdel, sub_flat, xdrop, tile, ref_len, query_len, *,
                       W: int, left: bool, BR: int = 256,
                       interpret: bool = False, with_counts: bool = True):
    """Scan one W-wide window for B hits with a single fused kernel.

    r/q: (B, W) int32 window codes (extension order: reversed for left);
    loc_r/loc_q: (B,) anchor positions (in-bounds masks are derived in
    -kernel); state arrays (B,) / (B, 4) as in extension_window_step.
    Returns the six updated state arrays."""
    B = r.shape[0]
    misc = jnp.stack([jnp.int32(xdrop), jnp.int32(tile),
                      jnp.int32(ref_len), jnp.int32(query_len)])
    col = lambda a: a.reshape(B, 1)

    grid = (B // BR,)
    row_spec = pl.BlockSpec((BR, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((BR, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    four_spec = pl.BlockSpec((BR, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec((1, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    misc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_window_scan_kernel, W=W, left=left,
                          with_counts=with_counts),
        grid=grid,
        in_specs=[row_spec, row_spec, one_spec, one_spec, one_spec,
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
    )(r, q, col(loc_r), col(loc_q), col(cum), col(maxv), col(maxp),
      col(done.astype(jnp.int32)), counts, cdel, _sub128(sub_flat), misc)

    o_cum, o_maxv, o_maxp, o_done, o_counts, o_cdel = out
    return (o_done.reshape(B) != 0, o_cum.reshape(B), o_maxv.reshape(B),
            o_maxp.reshape(B), o_counts, o_cdel)


def _first_scan_kernel(r2_ref, q2_ref, lr_ref, lq_ref, valid_ref, sub_ref,
                       misc_ref, *out_refs, W: int,
                       with_counts: bool = True):
    """Both directions' FIRST windows in one kernel over (BR, 2W) rows.

    Lanes [0, W) hold sequence positions [loc - W, loc) in natural order
    and are scanned right-to-left with the mirrored scans (the left
    extension, without materializing reversed copies); lanes [W, 2W) hold
    [loc, loc + W) for the right extension. Initial state is implicit
    (cum = 0, maxv = 0, maxp = -1 right / 0 left, counts = cdel = 0), so
    the twelve init-state operands of the generic window kernel vanish.
    Semantics per direction are identical to _window_scan_kernel at
    tile == 0; equivalence is covered by the engine-parity tests."""
    xdrop = misc_ref[0]
    ref_len = misc_ref[1]
    query_len = misc_ref[2]
    r2 = r2_ref[:]
    q2 = q2_ref[:]
    lr = lr_ref[:]  # (BR, 1)
    lq = lq_ref[:]
    alive = valid_ref[:] != 0
    BR = r2.shape[0]
    sc2 = _lookup_scores(r2 * 8 + q2, sub_ref, BR, 2 * W)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)

    for left in (False, True):
        half = slice(0, W) if left else slice(W, 2 * W)
        r, q, sc = r2[:, half], q2[:, half], sc2[:, half]
        if left:
            p = W - lanes  # extension offset of lane l is W - l
            inb = (lr >= p) & (lq >= p)
            cumsum, cummax, cumor = _lane_rcumsum, _lane_rcummax, \
                _lane_rcumor
            edge_lane = slice(0, 1)
            init_maxp = 0
        else:
            p = lanes
            inb = ((lr + p) < ref_len) & ((lq + p) < query_len)
            cumsum, cummax, cumor = _lane_cumsum, _lane_cummax, _lane_cumor
            edge_lane = slice(W - 1, W)
            init_maxp = -1
        sc = jnp.where(inb, sc, 0)
        cum = cumsum(sc, W)
        runmax = cummax(cum, W)
        m = jnp.maximum(0, runmax)  # maxv0 == 0
        drop = (m - cum) > xdrop
        dropc = cumor(drop, W)
        anydrop = dropc[:, edge_lane]
        before = jnp.logical_not(dropc)

        best_in = jnp.max(jnp.where(before, cum, NEG), axis=1,
                          keepdims=True)
        Mv = jnp.maximum(0, best_in)
        is_new = Mv > 0
        hit = (cum == Mv) & before
        if left:
            # earliest extension offset == largest lane achieving the max
            jmax = jnp.max(jnp.where(hit, lanes, -1), axis=1,
                           keepdims=True)
            Mp = jnp.where(is_new, W - jmax, init_maxp)
        else:
            j = jnp.min(jnp.where(hit, lanes, W), axis=1, keepdims=True)
            Mp = jnp.where(is_new, j, init_maxp)

        edge = jnp.logical_not(inb[:, edge_lane])
        finish = anydrop | edge

        (o_done, o_cum, o_maxv, o_maxp, o_counts, o_cdel) = \
            out_refs[6:] if left else out_refs[:6]
        if with_counts:
            match = inb & (r == q) & (r < 4)
            in_ext = p <= Mp
            add_in = []
            add_out = []
            for c in range(4):
                mc = match & (r == c)
                add_in.append(jnp.sum(mc & in_ext, axis=1, keepdims=True,
                                      dtype=jnp.int32))
                add_out.append(jnp.sum(mc & jnp.logical_not(in_ext),
                                       axis=1, keepdims=True,
                                       dtype=jnp.int32))
            o_counts[:] = jnp.where(alive,
                                    jnp.concatenate(add_in, axis=1), 0)
            o_cdel[:] = jnp.where(alive,
                                  jnp.concatenate(add_out, axis=1), 0)
        else:
            # lazy entropy: host recomputes counts from final extents
            o_counts[:] = jnp.zeros(o_counts.shape, jnp.int32)
            o_cdel[:] = jnp.zeros(o_cdel.shape, jnp.int32)
        o_done[:] = jnp.logical_or(jnp.logical_not(alive),
                                   finish).astype(jnp.int32)
        last = slice(W - 1, W) if not left else slice(0, 1)
        o_cum[:] = jnp.where(alive, cum[:, last], 0)
        o_maxv[:] = jnp.where(alive, Mv, 0)
        o_maxp[:] = jnp.where(alive, Mp, init_maxp)


@functools.partial(jax.jit, static_argnames=("W", "BR", "interpret",
                                             "with_counts"))
def first_scan_pallas(r2, q2, loc_r, loc_q, valid, sub_flat, xdrop,
                      ref_len, query_len, *, W: int, BR: int = 128,
                      interpret: bool = False, with_counts: bool = True):
    """First extension windows of BOTH directions from one (B, 2W) gather.

    Returns (st_right, st_left): dicts of the six post-first-window state
    arrays, exactly as two _window_scan_kernel calls at tile == 0 on fresh
    state would produce."""
    B = r2.shape[0]
    misc = jnp.stack([jnp.int32(xdrop), jnp.int32(ref_len),
                      jnp.int32(query_len)])
    col = lambda a: a.reshape(B, 1)

    grid = (B // BR,)
    row_spec = pl.BlockSpec((BR, 2 * W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((BR, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    four_spec = pl.BlockSpec((BR, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec((1, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    misc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    col_i32 = jax.ShapeDtypeStruct((B, 1), jnp.int32)
    col4_i32 = jax.ShapeDtypeStruct((B, 4), jnp.int32)

    out = pl.pallas_call(
        functools.partial(_first_scan_kernel, W=W,
                          with_counts=with_counts),
        grid=grid,
        in_specs=[row_spec, row_spec, one_spec, one_spec, one_spec,
                  sub_spec, misc_spec],
        out_specs=(one_spec, one_spec, one_spec, one_spec, four_spec,
                   four_spec) * 2,
        out_shape=(col_i32, col_i32, col_i32, col_i32, col4_i32,
                   col4_i32) * 2,
        interpret=interpret,
    )(r2, q2, col(loc_r), col(loc_q), col(valid.astype(jnp.int32)),
      _sub128(sub_flat), misc)

    def st(done, cum, maxv, maxp, counts, cdel):
        return dict(done=done.reshape(B) != 0, cum=cum.reshape(B),
                    maxv=maxv.reshape(B), maxp=maxp.reshape(B),
                    counts=counts, cdel=cdel)

    return st(*out[:6]), st(*out[6:])


ALIGN = 1024  # Mosaic HBM slice alignment for 1-D i8 memrefs
AWIN = 2048   # aligned bytes DMA'd per row for W <= 1024 windows


def awin_for(W: int) -> int:
    """Aligned superset bytes covering any W-byte window: the DMA starts
    at the ALIGN boundary at or before the window start."""
    return max(AWIN, W + ALIGN)


def _gather_rows_kernel(starts_ref, seq_ref, out_ref, buf, sems, *,
                        BR: int, W: int, AW: int):
    """DMA BR rows from HBM at arbitrary offsets.

    Mosaic only slices HBM at ALIGN boundaries, so each row copies the
    AWIN-byte aligned superset with all BR DMAs in flight at once
    (XLA's gather does ~3.4 us per row, latency-bound), then extracts the
    window with a per-row dynamic rotate (32-bit; i8 rotate unsupported).
    """
    i = pl.program_id(0)

    def dma(j):
        start = starts_ref[i * BR + j]
        aligned = (start // ALIGN) * ALIGN
        return pltpu.make_async_copy(
            seq_ref.at[pl.ds(aligned, AW)],
            buf.at[pl.ds(j * AW, AW)], sems.at[j])

    def start_one(j, _):
        dma(j).start()
        return 0

    jax.lax.fori_loop(0, BR, start_one, 0)

    def wait_one(j, _):
        dma(j).wait()
        return 0

    jax.lax.fori_loop(0, BR, wait_one, 0)

    # extraction in sublane-aligned groups of 8 rows (Mosaic requires
    # dynamic dim-0 indices to be provable multiples of 8)
    def extract8(t, _):
        base = pl.multiple_of(t * 8, 8)
        rows = []
        for c in range(8):
            start = starts_ref[i * BR + base + c]
            off = start - (start // ALIGN) * ALIGN
            row = buf[pl.ds((base + c) * AW, AW)].reshape(1, AW)
            rolled = pltpu.roll(row.astype(jnp.int32), AW - off, 1)
            rows.append(rolled[:, :W])
        out_ref[pl.ds(base, 8), :] = jnp.concatenate(rows, axis=0)
        return 0

    jax.lax.fori_loop(0, BR // 8, extract8, 0)


@functools.partial(jax.jit, static_argnames=("W", "BR", "interpret"))
def gather_rows_pallas(seq_pad, starts, *, W: int, BR: int = 256,
                       interpret: bool = False):
    """(B,) start offsets -> (B, W) int32 rows, DMA-pipelined.

    Callers must guarantee starts in [0, len(seq_pad) - awin_for(W)]."""
    B = starts.shape[0]
    AW = awin_for(W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BR,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BR, W), lambda i, starts: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BR * AW,), jnp.uint8),
                        pltpu.SemaphoreType.DMA((BR,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_rows_kernel, BR=BR, W=W, AW=AW),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, seq_pad)


def _gather_qtile_kernel(bases_ref, starts_ref, seq2d_ref, out_ref, tile,
                         sems, *, BR: int, W: int, T: int):
    """Shared-tile gather for SORTED starts: one (T, 128) tile DMA per
    BR-row block (vs BR per-row DMAs), windows extracted from VMEM with
    one-hot MXU row selects + one lane gather per 128-byte slab.

    The native seeder emits hits in query-position order, so the q-side
    window starts of a program are non-decreasing and a block of BR
    consecutive hits spans a few hundred bytes — the caller verifies
    every block's span fits the tile (gather_rows_qtile_ok) and falls
    back to the per-row kernel otherwise. bases_ref holds each block's
    tile base ROW (multiple of 8, i.e. a 1024-byte-aligned byte offset;
    Mosaic only slices HBM at those boundaries)."""
    b = pl.program_id(0)
    nblk = pl.num_programs(0)

    def dma(slot, blk):
        return pltpu.make_async_copy(
            seq2d_ref.at[pl.ds(pl.multiple_of(bases_ref[blk], 8), T), :],
            tile.at[slot], sems.at[slot])

    @pl.when(b == 0)
    def _():
        dma(0, 0).start()

    @pl.when(b + 1 < nblk)
    def _():
        dma((b + 1) % 2, b + 1).start()

    dma(b % 2, b).wait()

    tl = tile[b % 2].astype(jnp.int32).astype(jnp.bfloat16)  # (T, 128)
    starts = starts_ref[:]                                   # (BR, 1)
    base_byte = bases_ref[b] * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 1)
    tcol = jax.lax.broadcasted_iota(jnp.int32, (BR, T), 1)
    G = W // 128
    for g in range(G):
        F = starts + g * 128                # (BR, 1) slab start byte
        ridx = F // 128 - bases_ref[b]      # tile row of slab start
        dc = jnp.broadcast_to(F - (F // 128) * 128, (BR, 128))
        selA = (tcol == ridx).astype(jnp.bfloat16)
        selB = (tcol == (ridx + 1)).astype(jnp.bfloat16)
        rowsA = jnp.dot(selA, tl,
                        preferred_element_type=jnp.float32).astype(
                            jnp.int32)
        rowsB = jnp.dot(selB, tl,
                        preferred_element_type=jnp.float32).astype(
                            jnp.int32)
        # carry-row select on SOURCE lanes (runs before the gather):
        # output lane c reads source lane c' = (c + dc) % 128, which
        # lives in the carry row iff c + dc >= 128 iff c' < dc
        C = jnp.where(lane < dc, rowsB, rowsA)
        idx = lane + dc - jnp.where(lane + dc >= 128, 128, 0)
        out_ref[:, g * 128:(g + 1) * 128] = jnp.take_along_axis(
            C, idx, axis=1)


@functools.partial(jax.jit, static_argnames=("W", "BR", "T", "interpret"))
def gather_rows_qtile(seq2d, starts, *, W: int, BR: int = 128,
                      T: int = 64, interpret: bool = False):
    """(B,) SORTED start offsets -> (B, W) int32 rows via per-block
    shared tiles. Bit-identical output to gather_rows_pallas when every
    block satisfies gather_rows_qtile_ok; ~1 tile DMA per BR rows
    instead of BR row DMAs (the per-row DMA issue/extract is the
    dominant fixed cost of the first window — docs/DESIGN.md round-5
    roofline correction)."""
    B = starts.shape[0]
    nblk = B // BR
    # block base rows from the per-block MIN start (sortedness is NOT
    # required — clustered-but-unsorted starts, e.g. ref positions
    # inside a tandem array, work the same; the caller's span check is
    # min/max-based)
    bases = (jnp.min(starts.reshape(nblk, BR), axis=1)
             // ALIGN) * (ALIGN // 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((BR, 1), lambda i, bases: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BR, W), lambda i, bases: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, T, 128), jnp.uint8),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_qtile_kernel, BR=BR, W=W, T=T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bases, starts.reshape(B, 1), seq2d)


def gather_qtile_spans_ok(starts: "np.ndarray", W: int, seq_rows: int,
                          BR: int = 128, T: int = 64) -> bool:
    """Host-side check that every BR-row block's windows fit a (T, 128)
    tile anchored at the block's min start (numpy, pre-dispatch; starts
    need NOT be sorted — clustering is what matters). Also verifies the
    tile DMA stays inside the padded sequence."""
    import numpy as np
    n = len(starts)
    if n == 0 or n % BR:
        return False
    s = np.asarray(starts).reshape(-1, BR)
    base = (s.min(axis=1) // ALIGN) * ALIGN
    if np.any(s.max(axis=1) + W > base + T * 128):
        return False
    return bool(np.all(base // 128 + T <= seq_rows))
