"""Tile-shared first-window extension kernel (the round-3 engine).

The round-2 profile pinned ~half of extension time on per-hit window
gathers: one HBM DMA per hit per sequence (~85 ns/row issue+wait plus a
16-vreg rotate; see extend_pallas._gather_rows_kernel). But hits sorted by
reference position are a few dozen bytes apart on seed-dense data, so a
group of BR consecutive sorted hits spans a few KB of reference: this
kernel DMAs ONE reference tile + ONE query tile per group (double
-buffered across grid steps) and extracts every hit's 2W-byte window from
VMEM with one-hot MXU matmuls (row select) + a per-row lane gather (byte
rotate) — 35 ns/hit measured vs 170 ns/hit for the per-row-DMA pair, at
double the window width.

Windows land in a "tall" (BR*2G, 128) layout (G = W/128; 8 sublane rows
per hit at W=512) — the natural TPU tiling, no relayout — and the dual
-direction first-window scan runs in the same kernel: lane scans within
rows + sublane carries across each hit's rows. Semantics are identical to
extend_pallas._first_scan_kernel (itself the tile-width-independent
re-expression of the reference's warp tile-32 x-drop loop,
/root/reference/src/seed_filter.cu:232-652); parity is enforced by
tests/test_extend_tiled.py against the wide kernel and the oracle.

Host-side, plan_tiled_groups orders hits by (query bucket, ref position)
— a two-level ordering that gives BOTH sequences tile locality — splits
them into span-capped groups padded to BR rows, and carries the original
hit index through so downstream compaction restores reference hit order.
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


def tile_cap_bytes(trows: int, W: int) -> int:
    """Max start-byte span of a group given its tile size: the tile must
    cover [min_start_aligned, max_start + 2W), with the 1024 B alignment
    slack of the aligned base."""
    return trows * 128 - 2 * W - 1024


def plan_tiled_groups(ref_loc, query_loc, *, W: int, pad: int,
                      BR: int = DEF_BR, trows: int = DEF_TROWS,
                      qbucket: int = 24576, trows_q: int = 0):
    """Order hits (query-bucket, ref) and split into tile groups.

    Returns dict with per-row arrays padded to ngroups*BR (int32):
      rl, ql   — hit locations in planned order (pad rows repeat row 0 of
                 their group, so their window reads stay inside the tile)
      valid    — bool, False for pad rows
      orig     — original hit index (for order-restoring compaction)
    and per-group arrays: rbase, qbase — 8-multiple tile base rows into
    the padded 2-D sequence arrays.

    Window start bytes are (pad + loc - W) into the padded sequence, so
    base rows are computed on that scale.
    """
    n = len(ref_loc)
    cap = tile_cap_bytes(trows, W)   # trows sizes the REF tile (r span)
    # the q tile (trows_q rows; defaults to the ref tile height) covers a
    # whole q bucket (hits within a group are r-sorted, so q is NOT
    # monotone within the bucket): bucket + windows + align slack must
    # fit the tile
    trows_q = trows_q or trows
    assert qbucket + 2 * W + 2048 <= trows_q * 128, (qbucket, trows_q, W)
    from ..native import plan_tiled_groups_native, plan_tiled_sort_native
    nat = plan_tiled_groups_native(ref_loc, query_loc, W=W, pad=pad, BR=BR,
                                   cap=cap, qbucket=qbucket)
    if nat is not None:
        return nat
    order = plan_tiled_sort_native(ref_loc, query_loc, qbucket)
    if order is None:  # numpy fallback (no native toolchain)
        bucket64 = query_loc.astype(np.int64) // qbucket
        order = np.argsort(bucket64 * (1 << 33) + ref_loc.astype(np.int64),
                           kind="stable").astype(np.int32)
    bucket = query_loc.astype(np.int64) // qbucket
    rl = ref_loc[order]
    ql = query_loc[order]
    bk = bucket[order]

    rs = (rl.astype(np.int64) + (pad - W))   # window start bytes, >= 0
    # vectorized grouping: a CELL is (q bucket, rs // cap); rs-span within
    # a cell is <= cap by construction. Cells split into groups of <= BR
    # consecutive hits.
    cell = bk * (1 << 33) + rs // cap
    new_cell = np.empty(n, bool)
    if n:
        new_cell[0] = True
        new_cell[1:] = cell[1:] != cell[:-1]
    cell_start = np.maximum.accumulate(
        np.where(new_cell, np.arange(n, dtype=np.int64), 0))
    rank = np.arange(n, dtype=np.int64) - cell_start     # rank within cell
    new_group = new_cell | (rank % BR == 0)
    gidx = np.cumsum(new_group) - 1                      # group per hit
    ngroups = int(gidx[-1]) + 1 if n else 0
    slot = rank % BR                                     # row within group

    rl_p = np.zeros(ngroups * BR, np.int32)
    ql_p = np.zeros(ngroups * BR, np.int32)
    orig = np.zeros(ngroups * BR, np.int32)
    valid = np.zeros(ngroups * BR, bool)
    dst = gidx * BR + slot
    rl_p[dst] = rl
    ql_p[dst] = ql
    orig[dst] = order
    valid[dst] = True
    group_first = np.flatnonzero(new_group)
    # pad rows mirror their group's first hit so tile reads stay in range
    pad_rows = ~valid
    fill = np.repeat(group_first, BR)[:ngroups * BR]
    rl_p[pad_rows] = rl[fill[pad_rows]]
    ql_p[pad_rows] = ql[fill[pad_rows]]
    rbase = ((rs[group_first] // 1024) * 8).astype(np.int32)
    qs_low = bk[group_first] * qbucket + (pad - W)
    qbase = ((qs_low // 1024) * 8).astype(np.int32)
    return dict(rl=rl_p, ql=ql_p, valid=valid, orig=orig, rbase=rbase,
                qbase=qbase, ngroups=ngroups)


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


def _hit_reduce(x, BR: int, G2: int, op, unit, lane_op):
    """Per-hit scalar: combine each hit's G2 rows, then its lanes.
    Returns (BR, 1)."""
    inc = _hit_row_incl(x, G2, op, unit, bwd=False)
    last = inc.reshape(BR, G2, 128)[:, G2 - 1, :]
    return lane_op(last, axis=1, keepdims=True)


def _hit_bcast(s, BR: int, G2: int):
    """(BR, 1) per-hit scalar -> dense (BR*G2, 128)."""
    b2 = jnp.broadcast_to(s, (BR, 128))
    b3 = jnp.broadcast_to(b2[:, None, :], (BR, G2, 128))
    return b3.reshape(BR * G2, 128)


def _half_reduce(x, BR, G, op, unit, lane_op):
    """Per-hit PER-DIRECTION scalars from a dense (BR*2G, 128) block whose
    halves are G-row groups: returns ((BR, 1) left, (BR, 1) right). The
    within-half row combine is _hit_row_incl at pitch G (row % G masks
    stop the carry at half boundaries)."""
    G2 = 2 * G
    inc = _hit_row_incl(x, G, op, unit, bwd=False)
    x3 = inc.reshape(BR, G2, 128)
    l = lane_op(x3[:, G - 1, :], axis=1, keepdims=True)
    r = lane_op(x3[:, G2 - 1, :], axis=1, keepdims=True)
    return l, r


def _half_bcast(lv, rv, BR, G, isleft):
    """Per-direction (BR, 1) scalars -> dense (BR*2G, 128)."""
    G2 = 2 * G
    lb = _hit_bcast(lv, BR, G2)
    rb = _hit_bcast(rv, BR, G2)
    return jnp.where(isleft, lb, rb)


def _extract_windows_dual(tile_u8, loc_pad, base_row, BR, G, T):
    """Both directions' first windows from one tile, in SCAN ORDER.

    loc_pad: (BR, 1) anchor byte (pad + loc) into the padded sequence;
    base_row: the group's tile base row. Returns (BR*2G, 128) int32 where
    each hit owns 2G rows: rows [0, G) hold the LEFT window bytes
    MIRRORED (scan position s = ext offset p-1; byte loc-1-s) and rows
    [G, 2G) the RIGHT window (s = p; byte loc+s). The mirrored left half
    makes BOTH directions forward scans, so one cumsum/cummax pass serves
    both.

    Row selection is a one-hot MXU matmul (two SEL matrices: the in-row
    and the carry row differ by -1 for mirrored rows, +1 for forward
    rows); the byte permutation within the row is one lane gather.
    Out-of-tile one-hot rows are all-zero — only reachable by carry rows
    whose lanes are never selected (the planner keeps real windows inside
    the tile).

    All index arithmetic stays in 2-D (N, 128) form: the original 3-D
    (BR, G2, 128) iota + where + divide chain MISCOMPILES under Mosaic at
    G2 = 4 (W = 256) — compiled ridx came out off-by-2 vs interpret mode
    on the same inputs (silently selecting the wrong tile rows, i.e.
    garbage windows), while G2 = 8 (W = 512) compiled correctly. The 2-D
    re-expression is bit-identical in interpret mode and compiles
    correctly at every G."""
    G2 = 2 * G
    N = BR * G2
    rowg = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 0) % G2
    left = rowg < G
    lp = _hit_bcast(loc_pad, BR, G2)
    # byte at lane 0 of each out-row
    F = jnp.where(left, lp - 1 - rowg * 128, lp + (rowg - G) * 128)
    ridx = F // 128 - base_row
    dc = F - (F // 128) * 128
    tcol = jax.lax.broadcasted_iota(jnp.int32, (N, T), 1)
    selA = (tcol == ridx[:, :1]).astype(jnp.bfloat16)
    ridx_b = ridx + jnp.where(left, -1, 1)
    selB = (tcol == ridx_b[:, :1]).astype(jnp.bfloat16)
    tl = tile_u8[:].astype(jnp.int32).astype(jnp.bfloat16)
    rowsA = jnp.dot(selA, tl,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    rowsB = jnp.dot(selB, tl,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
    # the carry-row select runs BEFORE the lane gather, so its condition
    # is on the SOURCE lane c' of output lane c:
    #   right: c' = (c + dc) % 128, carry row needed iff c + dc >= 128
    #          iff c' < dc
    #   left:  c' = (dc - c) % 128, carry row needed iff c > dc
    #          iff c' > dc
    use_b = ((left & (lane > dc))
             | (jnp.logical_not(left) & (lane < dc)))
    C = jnp.where(use_b, rowsB, rowsA)
    idx = jnp.where(left,
                    dc - lane + jnp.where(lane > dc, 128, 0),
                    lane + dc - jnp.where(lane + dc >= 128, 128, 0))
    return jnp.take_along_axis(C, idx, axis=1)


def _lookup_scores_tall(idx, sub_ref, N):
    tb = jnp.broadcast_to(sub_ref[:1, :], (N, 128))
    return jnp.take_along_axis(tb, idx, axis=1)


def _first_scan_tiled_kernel(rbase_ref, qbase_ref, lr_ref, lq_ref,
                             valid_ref, sub_ref, misc_ref, ref_hbm, q_hbm,
                             *out_refs, W: int, BR: int, TR: int, TQ: int,
                             pad: int, with_counts: bool = True):
    """Fused: tile DMAs + dual window extraction + dual first-window scan.

    Semantics per direction identical to extend_pallas._first_scan_kernel
    at tile == 0 on fresh state (oracle-anchored; parity-tested). Data
    layout: each hit owns 2G dense sublane rows in a (BR*2G, 128) block,
    rows [0, G) = LEFT window in scan order (mirrored bytes), rows
    [G, 2G) = RIGHT window; both directions share every scan pass, with
    within-half row masks stopping carries at half boundaries. Per-hit
    /per-direction reductions lane-reduce first (one full pass) and
    finish on tiny (N, 1) / (BR, G2) arrays."""
    G = W // 128
    G2 = 2 * G
    xdrop = misc_ref[0]
    ref_len = misc_ref[1]
    query_len = misc_ref[2]
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    rtile, qtile, sems = out_refs[-3:]
    out_refs = out_refs[:-3]
    # all-pad groups (rbase < 0, a suffix appended by the dispatcher to
    # reach a pow2 program class) skip the DMAs and the heavy compute:
    # padding then costs ~nothing instead of a full group's MXU work
    gval = rbase_ref[i] >= 0

    def dma_r(slot, gi):
        return pltpu.make_async_copy(
            ref_hbm.at[pl.ds(pl.multiple_of(rbase_ref[gi], 8), TR), :],
            rtile.at[slot], sems.at[0, slot])

    def dma_q(slot, gi):
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(pl.multiple_of(qbase_ref[gi], 8), TQ), :],
            qtile.at[slot], sems.at[1, slot])

    nxt = jnp.minimum(i + 1, nprog - 1)   # clamp: reading, not starting

    @pl.when(i == 0)
    def _():
        dma_r(0, 0).start()
        dma_q(0, 0).start()

    @pl.when((i + 1 < nprog) & (rbase_ref[nxt] >= 0))
    def _():
        dma_r((i + 1) % 2, nxt).start()
        dma_q((i + 1) % 2, nxt).start()

    @pl.when(jnp.logical_not(gval))
    def _():
        # defaults: exactly what the scan emits for an all-invalid group
        for left in (True, False):
            (o_done, o_cum, o_maxv, o_maxp, o_counts, o_cdel) = \
                out_refs[6:12] if left else out_refs[0:6]
            o_done[:] = jnp.ones((BR, 1), jnp.int32)
            o_cum[:] = jnp.zeros((BR, 1), jnp.int32)
            o_maxv[:] = jnp.zeros((BR, 1), jnp.int32)
            o_maxp[:] = jnp.full((BR, 1), 0 if left else -1, jnp.int32)
            o_counts[:] = jnp.zeros((BR, 4), jnp.int32)
            o_cdel[:] = jnp.zeros((BR, 4), jnp.int32)

    @pl.when(gval)
    def _():
        _scan_group(rbase_ref, qbase_ref, lr_ref, lq_ref, valid_ref,
                    sub_ref, out_refs, rtile, qtile, dma_r, dma_q, i,
                    xdrop, ref_len, query_len, W=W, BR=BR, TR=TR, TQ=TQ,
                    pad=pad, with_counts=with_counts)


def _scan_group(rbase_ref, qbase_ref, lr_ref, lq_ref, valid_ref, sub_ref,
                out_refs, rtile, qtile, dma_r, dma_q, i, xdrop, ref_len,
                query_len, *, W: int, BR: int, TR: int, TQ: int, pad: int,
                with_counts: bool = True):
    G = W // 128
    G2 = 2 * G
    dma_r(i % 2, i).wait()
    dma_q(i % 2, i).wait()

    lr = lr_ref[:]          # (BR, 1) anchor locations
    lq = lq_ref[:]
    alive = valid_ref[:] != 0
    N = BR * G2

    rows_r = _extract_windows_dual(rtile[i % 2], lr + pad, rbase_ref[i],
                                   BR, G, TR)
    rows_q = _extract_windows_dual(qtile[i % 2], lq + pad, qbase_ref[i],
                                   BR, G, TQ)
    sc_all = _lookup_scores_tall(rows_r * 8 + rows_q, sub_ref, N)

    rowg = _hit_rows(sc_all, G2)          # row within hit [0, 2G)
    hrow = rowg % G                       # row within half [0, G)
    isleft = rowg < G
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
    s = hrow * 128 + lane                 # scan position within half
    # extension offset: left p = s + 1 (offsets 1..W), right p = s
    p = jnp.where(isleft, s + 1, s)
    lrb = _hit_bcast(lr, BR, G2)
    lqb = _hit_bcast(lq, BR, G2)
    inb = ((isleft & (lrb >= p) & (lqb >= p))
           | (jnp.logical_not(isleft)
              & ((lrb + p) < ref_len) & ((lqb + p) < query_len)))
    INF = 1 << 30

    # ONE forward masked scan serves both directions (left half mirrored);
    # within-half carries reset at the G-row half boundaries (pitch G)
    sc = jnp.where(inb, sc_all, 0)
    cum = _hit_cumsum(sc, G, bwd=False)
    runmax = _hit_cummax(cum, G, bwd=False)
    m = jnp.maximum(0, runmax)            # maxv0 == 0
    drop = (m - cum) > xdrop
    fd_l, fd_r = _half_reduce(jnp.where(drop, p, INF), BR, G,
                              jnp.minimum, INF, jnp.min)
    before = p < _half_bcast(fd_l, fd_r, BR, G, isleft)
    bi_l, bi_r = _half_reduce(jnp.where(before, cum, NEG), BR, G,
                              jnp.maximum, NEG, jnp.max)
    Mv_l = jnp.maximum(0, bi_l)
    Mv_r = jnp.maximum(0, bi_r)
    hit = (cum == _half_bcast(Mv_l, Mv_r, BR, G, isleft)) & before
    pm_l, pm_r = _half_reduce(jnp.where(hit, p, INF), BR, G, jnp.minimum,
                              INF, jnp.min)
    # final per-direction Mp: the reference's init values when no
    # positive max was reached (left 0, right -1)
    Mp_l = jnp.where(Mv_l > 0, pm_l, 0)
    Mp_r = jnp.where(Mv_r > 0, pm_r, -1)

    if with_counts:
        # per-direction counts from ONE packed pass per base (low 16 bits
        # = inside the extension, high 16 = outside)
        match = inb & (rows_r == rows_q) & (rows_r < 4)
        in_ext = p <= _half_bcast(Mp_l, Mp_r, BR, G, isleft)
        packed = []
        for c in range(4):
            mc = match & (rows_r == c)
            v = jnp.where(mc, jnp.where(in_ext, 1, 1 << 16), 0)
            packed.append(_half_reduce(v, BR, G, jnp.add, 0, jnp.sum))

    # edge/out state at scan position W-1 of each half
    inb3 = inb.reshape(BR, G2, 128)
    cum3 = cum.reshape(BR, G2, 128)
    for left in (True, False):
        gend = G - 1 if left else G2 - 1
        half = (lambda pair: pair[0]) if left else (lambda pair: pair[1])
        init_maxp = 0 if left else -1
        anydrop = (fd_l if left else fd_r) < INF
        edge = jnp.logical_not(inb3[:, gend, :][:, 127:128])
        finish = anydrop | edge
        (o_done, o_cum, o_maxv, o_maxp, o_counts, o_cdel) = \
            out_refs[6:12] if left else out_refs[0:6]
        o_done[:] = jnp.logical_or(jnp.logical_not(alive),
                                   finish).astype(jnp.int32)
        o_cum[:] = jnp.where(alive, cum3[:, gend, :][:, 127:128], 0)
        o_maxv[:] = jnp.where(alive, Mv_l if left else Mv_r, 0)
        o_maxp[:] = jnp.where(alive, Mp_l if left else Mp_r, init_maxp)
        if with_counts:
            cnt_in = jnp.concatenate(
                [jnp.bitwise_and(half(pk), 0xFFFF) for pk in packed],
                axis=1)
            cnt_out = jnp.concatenate(
                [jnp.right_shift(half(pk), 16) for pk in packed], axis=1)
            o_counts[:] = jnp.where(alive, cnt_in, 0)
            o_cdel[:] = jnp.where(alive, cnt_out, 0)
        else:
            # lazy entropy: host recomputes counts from final extents
            o_counts[:] = jnp.zeros((BR, 4), jnp.int32)
            o_cdel[:] = jnp.zeros((BR, 4), jnp.int32)


@functools.partial(jax.jit, static_argnames=("W", "BR", "TR", "TQ", "pad",
                                             "interpret", "with_counts"))
def first_scan_tiled(ref2d, q2d, rbase, qbase, loc_r, loc_q, valid,
                     sub_flat, xdrop, ref_len, query_len, *, W: int,
                     pad: int, BR: int = DEF_BR, TR: int = DEF_TROWS,
                     TQ: int = DEF_TROWS, interpret: bool = False,
                     with_counts: bool = True):
    """First extension windows of BOTH directions for planned hit groups.

    ref2d/q2d: (rows, 128) uint8 padded sequences (pad_sequence_2d);
    rbase/qbase: (ngroups,) tile base rows; loc_r/loc_q/valid:
    (ngroups*BR,) planned row arrays. Returns (st_right, st_left) dicts
    exactly like extend_pallas.first_scan_pallas."""
    from .extend_pallas import _sub128
    B = loc_r.shape[0]
    ngroups = B // BR
    misc = jnp.stack([jnp.int32(xdrop), jnp.int32(ref_len),
                      jnp.int32(query_len)])
    col = lambda a: a.reshape(B, 1)
    one_spec = pl.BlockSpec((BR, 1), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    four_spec = pl.BlockSpec((BR, 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    col_i32 = jax.ShapeDtypeStruct((B, 1), jnp.int32)
    col4_i32 = jax.ShapeDtypeStruct((B, 4), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ngroups,),
        in_specs=[one_spec, one_spec, one_spec, sub_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(one_spec, one_spec, one_spec, one_spec, four_spec,
                   four_spec) * 2,
        scratch_shapes=[pltpu.VMEM((2, TR, 128), jnp.uint8),
                        pltpu.VMEM((2, TQ, 128), jnp.uint8),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )
    out = pl.pallas_call(
        functools.partial(_first_scan_tiled_kernel, W=W, BR=BR, TR=TR,
                          TQ=TQ, pad=pad, with_counts=with_counts),
        grid_spec=grid_spec,
        out_shape=(col_i32, col_i32, col_i32, col_i32, col4_i32,
                   col4_i32) * 2,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
    )(rbase, qbase, col(loc_r), col(loc_q),
      col(valid.astype(jnp.int32)), _sub128(sub_flat), misc, ref2d, q2d)

    def st(done, cum, maxv, maxp, counts, cdel):
        return dict(done=done.reshape(B) != 0, cum=cum.reshape(B),
                    maxv=maxv.reshape(B), maxp=maxp.reshape(B),
                    counts=counts, cdel=cdel)

    return st(*out[:6]), st(*out[6:])


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
