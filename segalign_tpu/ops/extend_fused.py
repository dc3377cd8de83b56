"""Single-program x-drop extension: first window + continuation while_loops.

One jitted program extends a whole hit batch to completion (both
directions), replacing the host-stepped window loop of ops/extend3 whose
per-window host sync costs a full tunnel round trip (~40 ms measured) in
this environment. Semantics are identical: the per-window step body is
literally ops/extend3._extension_window_step_jit, whose tile-width
independence and entropy fold rule are property-tested against the
reference tile-32 algorithm (oracle/scan_spec.py; CUDA source
/root/reference/src/seed_filter.cu:232-652).

Program structure per direction:
  1. one dense window step over the full (HBUF,) batch at width W
  2. lax.while_loop of full-batch steps while more than CONT rows live
     (rare: only repeat-dense batches)
  3. stable-argsort compaction of the <= CONT live rows, then a
     lax.while_loop of (CONT, W)-shaped steps until all rows terminate
  4. merge compacted state back (gather-only, as extend3._scatter_rows)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .extend3 import _finalize, window_step_fn

_STATE = ("done", "cum", "maxv", "maxp", "counts", "cdel")


_USE_TALL_STEP = os.environ.get("SEGALIGN_TSTEP", "") != "0"
# SEGALIGN_JOINT_TAIL=0 restores the serial per-direction continuation
_USE_JOINT_TAIL = os.environ.get("SEGALIGN_JOINT_TAIL", "") != "0"


# The row-gather kernel prefetches its (B,) int32 starts into SMEM
# (1 MB on v5e), so ONE pallas_call handles at most 2^17 rows; bigger
# batches are served by consecutive calls on row slices inside the same
# jit program (the SMEM limit is per call, not per program — this is
# what lets HBUF exceed 2^17).
_GATHER_MAX_ROWS = 1 << 17


def _gather_blocked(seq, starts, *, W, interpret=False):
    from .extend_pallas import gather_rows_pallas
    B = starts.shape[0]
    if B <= _GATHER_MAX_ROWS:
        return gather_rows_pallas(seq, starts, W=W, BR=min(256, B),
                                  interpret=interpret)
    return jnp.concatenate(
        [gather_rows_pallas(seq, starts[i:i + _GATHER_MAX_ROWS], W=W,
                            BR=256, interpret=interpret)
         for i in range(0, B, _GATHER_MAX_ROWS)], axis=0)


def _step_pallas(seq_r, seq_q, loc_r, loc_q, tile, st, sub_flat, xdrop,
                 ref_len, query_len, *, pad, W, left, interpret=False,
                 with_counts=True):
    """Window step as DMA row-gathers + the fused Pallas scan kernel.

    The scan runs in the dense tall layout by default (extend_tiled
    .window_scan_tall — the (B, W) gather output reshapes to (B*W/128,
    128) for free, the left direction scans mirrored instead of reversing
    the data, and the pass-count tricks of the tiled first-window kernel
    apply). SEGALIGN_TSTEP=0 selects the original wide scan kernel
    (extend_pallas.window_scan_pallas); both are bit-exact vs the XLA
    step (window_step_fn). Requires sequences padded with right_pad >=
    awin_for(W)."""
    from .extend_pallas import gather_rows_pallas, window_scan_pallas, \
        awin_for
    AW = awin_for(W)
    B = loc_r.shape[0]
    if left:
        r_start = pad + loc_r - tile - W
        q_start = pad + loc_q - tile - W
    else:
        r_start = pad + loc_r + tile
        q_start = pad + loc_q + tile
    # done rows keep advancing `tile`; clamp their (masked, unused)
    # addresses into the DMA-able range
    r_start = jnp.clip(r_start, 0, seq_r.shape[0] - AW)
    q_start = jnp.clip(q_start, 0, seq_q.shape[0] - AW)
    r = _gather_blocked(seq_r, r_start, W=W, interpret=interpret)
    q = _gather_blocked(seq_q, q_start, W=W, interpret=interpret)
    if _USE_TALL_STEP:
        from .extend_tiled import window_scan_tall
        o_done, o_cum, o_maxv, o_maxp, o_counts, o_cdel = window_scan_tall(
            r, q, loc_r, loc_q, st["cum"], st["maxv"], st["maxp"],
            st["done"], st["counts"], st["cdel"], sub_flat, xdrop, tile,
            ref_len, query_len, W=W, left=left, interpret=interpret,
            with_counts=with_counts)
    else:
        # scan-kernel block height scales with window width (VMEM budget)
        BR = min(256, B, max(8, (1 << 17) // W))
        assert B % BR == 0 and BR % 8 == 0, (B, BR)
        if left:
            r = r[:, ::-1]
            q = q[:, ::-1]
        o_done, o_cum, o_maxv, o_maxp, o_counts, o_cdel = \
            window_scan_pallas(
                r, q, loc_r, loc_q, st["cum"], st["maxv"], st["maxp"],
                st["done"], st["counts"], st["cdel"], sub_flat, xdrop,
                tile, ref_len, query_len, W=W, left=left, BR=BR,
                interpret=interpret, with_counts=with_counts)
    out = dict(done=o_done, cum=o_cum, maxv=o_maxv, maxp=o_maxp,
               counts=o_counts, cdel=o_cdel)
    n_alive = jnp.sum(jnp.logical_not(o_done).astype(jnp.int32))
    return out, n_alive


def _step(seq_r, seq_q, loc_r, loc_q, tile, st, sub_flat, xdrop, ref_len,
          query_len, *, pad, W, left, engine="xla", with_counts=True):
    if engine in ("pallas", "pallas_interpret"):
        return _step_pallas(seq_r, seq_q, loc_r, loc_q, tile, st, sub_flat,
                            xdrop, ref_len, query_len, pad=pad, W=W,
                            left=left,
                            interpret=engine == "pallas_interpret",
                            with_counts=with_counts)
    out = window_step_fn().__wrapped__(
        seq_r, seq_q, loc_r, loc_q, tile, st["done"], st["cum"], st["maxv"],
        st["maxp"], st["counts"], st["cdel"], sub_flat, xdrop, ref_len,
        query_len, pad=pad, W=W, left=left, with_counts=with_counts)
    n_alive = out.pop("n_alive")
    return out, n_alive


def _alive_prefix(done, K: int):
    """Indices of the first K alive rows (in row order) plus each row's
    inclusive alive-rank cumsum — WITHOUT a full argsort.

    The previous compaction spent two stable B-row argsorts per cohort
    round (the dominant cost of the continuation at B = 2^18 when only
    ~1% of rows survive the first window); a blocked cumsum plus a
    K-query searchsorted does the same selection in O(B) adds. For
    j >= n_alive the index clamps to B-1 (a duplicate row): harmless —
    duplicate rows are either done (step no-ops) or merged back by rank,
    which picks each alive row's single true slot."""
    from .scan_utils import blocked_cumsum
    B = done.shape[0]
    cum = blocked_cumsum(jnp.logical_not(done).astype(jnp.int32))
    tgt = jnp.searchsorted(
        cum, jnp.arange(1, K + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    return jnp.minimum(tgt, B - 1), cum


def _merge_back(cst, st, cum, K: int):
    """Sort/scatter-free merge: alive rows of `st` with rank < K take the
    cohort result, everything else keeps its old state. `cum` is the
    alive-rank cumsum of st['done'] that selected the cohort."""
    rank = jnp.clip(cum - 1, 0, K - 1)
    sel = jnp.logical_not(st["done"]) & (cum <= K)
    out = {}
    for kk in _STATE:
        c = jnp.take(cst[kk], rank, axis=0)
        m = sel if st[kk].ndim == 1 else sel[:, None]
        out[kk] = jnp.where(m, c, st[kk])
    return out


def _cont_loop(seq_r, seq_q, c_lr, c_lq, cst, tile0, n_alive, sub_flat,
               xdrop, ref_len, query_len, *, pad, Wc, UNROLL, left, engine,
               stop=0, with_counts=True):
    """Continuation while_loop: UNROLL window steps of width Wc per
    iteration. The data-dependent loop condition serializes the device
    pipeline (~1 ms/iteration measured on v5e via this host link), so each
    iteration advances several windows; overshooting a finished batch is
    exact (steps are no-ops for done rows).

    Runs while more than `stop` rows are alive; returns (tile, state,
    n_alive) so a caller can recompact the survivors into a smaller batch
    (_cont_cascade)."""
    def cond(c):
        return c[2] > stop

    def body(c):
        tile, s, na = c
        for _ in range(UNROLL):
            s, na = _step(seq_r, seq_q, c_lr, c_lq, tile, s, sub_flat,
                          xdrop, ref_len, query_len, pad=pad, W=Wc,
                          left=left, engine=engine,
                          with_counts=with_counts)
            tile = tile + Wc
        return tile, s, na

    return jax.lax.while_loop(cond, body, (tile0, cst, n_alive))


def _cont_cascade(seq_r, seq_q, c_lr, c_lq, cst, tile0, n_alive, sub_flat,
                  xdrop, ref_len, query_len, *, pad, Wc, UNROLL, left,
                  engine, sizes, with_counts=True):
    """Run a cohort to completion through a cascade of shrinking batches.

    Window steps cost batch-linear work whether rows are alive or done;
    long extensions (tens of kb) keep only a handful of rows alive after
    the first few windows. So: step the full cohort while more than
    sizes[0] rows live, compact the survivors into a sizes[0]-row batch
    (they all sit at the same tile), recurse. Scheduling only — each
    row's extension is independent, so results are bit-identical. The
    deep tail of an extension then runs at sizes[-1]-row cost instead of
    the full cohort's."""
    if not sizes:
        _, cst, _ = _cont_loop(seq_r, seq_q, c_lr, c_lq, cst, tile0,
                               n_alive, sub_flat, xdrop, ref_len,
                               query_len, pad=pad, Wc=Wc, UNROLL=UNROLL,
                               left=left, engine=engine,
                               with_counts=with_counts)
        return cst
    nxt = sizes[0]
    tile, cst, na = _cont_loop(seq_r, seq_q, c_lr, c_lq, cst, tile0,
                               n_alive, sub_flat, xdrop, ref_len,
                               query_len, pad=pad, Wc=Wc, UNROLL=UNROLL,
                               left=left, engine=engine, stop=nxt,
                               with_counts=with_counts)
    tgt, cum = _alive_prefix(cst["done"], nxt)
    take = lambda a: jnp.take(a, tgt, axis=0)
    sst = {kk: take(cst[kk]) for kk in _STATE}
    s_na = jnp.minimum(na, nxt)
    sst = _cont_cascade(seq_r, seq_q, take(c_lr), take(c_lq), sst, tile,
                        s_na, sub_flat, xdrop, ref_len, query_len,
                        pad=pad, Wc=Wc, UNROLL=UNROLL, left=left,
                        engine=engine, sizes=sizes[1:],
                        with_counts=with_counts)
    return _merge_back(sst, cst, cum, nxt)


_CASCADE_ENV = os.environ.get("SEGALIGN_CASCADE", "")


def _cascade_sizes(CONT):
    """Shrinking cohort sizes: ONE stage at CONT/4 (floor 128). Each
    stage is its own data-dependent while_loop, and every while iteration
    stalls the device pipeline (~1 ms through this host link), so the
    ladder stays SHORT. Round-5 A/B at CONT=16384 on the repeat bench:
    (4096, 1024) -> 6.74 s, (4096,) -> 6.64 s, no cascade -> 7.60 s
    steady. SEGALIGN_CASCADE="2048,512" overrides for re-tuning;
    SEGALIGN_CASCADE=none disables."""
    if _CASCADE_ENV == "none":
        return ()
    if _CASCADE_ENV:
        sizes = tuple(int(x) for x in _CASCADE_ENV.split(",")
                      if 0 < int(x) < CONT)
        assert all(s & (s - 1) == 0 for s in sizes), sizes  # pow2 only
        return sizes
    return tuple(s for s in (CONT // 4,) if s >= 128)


def _cont_loop_joint(seq_r, seq_q, R, L, tile0, na_r, na_l, sub_flat,
                     xdrop, ref_len, query_len, *, pad, Wc, UNROLL,
                     engine, stop=0, with_counts=True):
    """Both directions' continuation loops fused into ONE while_loop.

    R/L are (loc_r, loc_q, state) for the right/left cohorts (selected
    independently — different rows survive each direction). Each
    iteration advances BOTH cohorts UNROLL windows; the loop runs while
    EITHER side has more than `stop` rows alive. Scheduling-only: a
    finished cohort's steps are no-ops. Halves the number of
    data-dependent while iterations vs running the directions serially —
    each iteration stalls the device pipeline, so iteration count is the
    continuation's fixed cost."""
    (lr_r, lq_r, st_r), (lr_l, lq_l, st_l) = R, L

    def cond(c):
        return jnp.maximum(c[2], c[4]) > stop

    def body(c):
        tile, sr, nr, sl, nl = c
        for _ in range(UNROLL):
            sr, nr = _step(seq_r, seq_q, lr_r, lq_r, tile, sr, sub_flat,
                           xdrop, ref_len, query_len, pad=pad, W=Wc,
                           left=False, engine=engine,
                           with_counts=with_counts)
            sl, nl = _step(seq_r, seq_q, lr_l, lq_l, tile, sl, sub_flat,
                           xdrop, ref_len, query_len, pad=pad, W=Wc,
                           left=True, engine=engine,
                           with_counts=with_counts)
            tile = tile + Wc
        return tile, sr, nr, sl, nl

    return jax.lax.while_loop(
        cond, body, (tile0, st_r, na_r, st_l, na_l))


def _cont_cascade_joint(seq_r, seq_q, R, L, tile0, na_r, na_l, sub_flat,
                        xdrop, ref_len, query_len, *, pad, Wc, UNROLL,
                        engine, sizes, with_counts=True):
    """Joint-direction analog of _cont_cascade: shrink both cohorts
    through the same size ladder, selecting each direction's survivors
    independently at every stage. Returns (st_right, st_left)."""
    tile, sr, nr, sl, nl = _cont_loop_joint(
        seq_r, seq_q, R, L, tile0, na_r, na_l, sub_flat, xdrop, ref_len,
        query_len, pad=pad, Wc=Wc, UNROLL=UNROLL, engine=engine,
        stop=sizes[0] if sizes else 0, with_counts=with_counts)
    if not sizes:
        return sr, sl
    nxt = sizes[0]

    def shrink(lr, lq, st):
        tgt, cum = _alive_prefix(st["done"], nxt)
        take = lambda a: jnp.take(a, tgt, axis=0)
        return (take(lr), take(lq), {kk: take(st[kk]) for kk in _STATE},
                cum)

    (lr_r, lq_r, _), (lr_l, lq_l, _) = R, L
    r_lr, r_lq, r_st, cum_r = shrink(lr_r, lq_r, sr)
    l_lr, l_lq, l_st, cum_l = shrink(lr_l, lq_l, sl)
    sub_r, sub_l = _cont_cascade_joint(
        seq_r, seq_q, (r_lr, r_lq, r_st), (l_lr, l_lq, l_st), tile,
        jnp.minimum(nr, nxt), jnp.minimum(nl, nxt), sub_flat, xdrop,
        ref_len, query_len, pad=pad, Wc=Wc, UNROLL=UNROLL, engine=engine,
        sizes=sizes[1:], with_counts=with_counts)
    return (_merge_back(sub_r, sr, cum_r, nxt),
            _merge_back(sub_l, sl, cum_l, nxt))


def _run_tails_joint(seq_r, seq_q, loc_r, loc_q, st_r, na_r, st_l, na_l,
                     sub_flat, xdrop, ref_len, query_len, *, pad, W, CONT,
                     engine, W_CONT=0, UNROLL=4, with_counts=True):
    """Continue BOTH directions after their first windows with shared
    while_loops (see _cont_loop_joint). Same contract as two _run_tail
    calls; bit-identical results, ~half the loop iterations."""
    Wc = W_CONT or W
    B = loc_r.shape[0]
    kw = dict(pad=pad, Wc=Wc, UNROLL=UNROLL, engine=engine,
              with_counts=with_counts)
    if B <= CONT:
        return _cont_cascade_joint(
            seq_r, seq_q, (loc_r, loc_q, st_r), (loc_r, loc_q, st_l),
            jnp.int32(W), na_r, na_l, sub_flat, xdrop, ref_len, query_len,
            sizes=_cascade_sizes(B), **kw)

    def round_cond(c):
        return jnp.maximum(c[1], c[3]) > 0

    def round_body(c):
        st_r, na_r, st_l, na_l = c

        def pick(st):
            tgt, cum = _alive_prefix(st["done"], CONT)
            take = lambda a: jnp.take(a, tgt, axis=0)
            return (take(loc_r), take(loc_q),
                    {kk: take(st[kk]) for kk in _STATE}, cum)

        r_lr, r_lq, r_st, cum_r = pick(st_r)
        l_lr, l_lq, l_st, cum_l = pick(st_l)
        sub_r, sub_l = _cont_cascade_joint(
            seq_r, seq_q, (r_lr, r_lq, r_st), (l_lr, l_lq, l_st),
            jnp.int32(W), jnp.minimum(na_r, CONT),
            jnp.minimum(na_l, CONT), sub_flat, xdrop, ref_len, query_len,
            sizes=_cascade_sizes(CONT), **kw)
        return (_merge_back(sub_r, st_r, cum_r, CONT),
                na_r - jnp.minimum(na_r, CONT),
                _merge_back(sub_l, st_l, cum_l, CONT),
                na_l - jnp.minimum(na_l, CONT))

    st_r, _, st_l, _ = jax.lax.while_loop(
        round_cond, round_body, (st_r, na_r, st_l, na_l))
    return st_r, st_l


def _first_steps_pallas(seq_r, seq_q, loc_r, loc_q, st_r, st_l, sub_flat,
                        xdrop, ref_len, query_len, *, pad, W,
                        interpret=False, with_counts=True, q2d=None,
                        qtile=False, r2d=None, rtile=False):
    """Both directions' first windows off ONE shared gather per sequence.

    The per-row DMA issue + aligned-superset extraction is the dominant
    per-hit cost (see extend_pallas._gather_rows_kernel); the 2W-wide
    aligned superset of [loc - W, loc + W) is the SAME AWIN bytes as
    either direction's alone, so gathering once and slicing halves the
    gather work of the first window. Directions are independent because
    the entropy counts fold is additive in its initial value (the left
    direction starts from zero counts; _extend_core adds the right
    direction's counts at finalize)."""
    from .extend_pallas import first_scan_pallas, awin_for, \
        gather_rows_qtile
    AW = awin_for(2 * W)
    B = loc_r.shape[0]
    # power-of-two block height: must be a multiple of 8 AND divide the
    # pow2 batch B (W=768 used to floor to 85 and crash the lowering)
    budget = max(8, (1 << 17) // (2 * W))
    BR = min(256, B, 1 << (budget.bit_length() - 1))
    r_start = jnp.clip(pad + loc_r - W, 0, seq_r.shape[0] - AW)
    q_start = jnp.clip(pad + loc_q - W, 0, seq_q.shape[0] - AW)
    valid = jnp.logical_not(st_r["done"])

    def slab(s):
        # gather + scan together per <= 2^17-row slice: the (slice, 2W)
        # int32 windows are ~8 KB/row and get consumed by the scan within
        # the slice, so a bigger-than-2^17 program's peak transients stay
        # slice-sized (a monolithic 2^18-row first window materialized
        # ~2 GB and measured slower than two 2^17 programs)
        sl = slice(s, s + _GATHER_MAX_ROWS)
        if rtile:
            # r-side shared-tile gather with a BIGGER tile (T=512,
            # 64 KB): ref positions are unsorted but CLUSTER on the
            # dense (tandem-repeat) programs where extension time
            # concentrates — per-block min/max spans verified by the
            # dispatcher
            r2 = gather_rows_qtile(r2d, r_start[sl], W=2 * W, T=512,
                                   interpret=interpret)
        else:
            r2 = _gather_blocked(seq_r, r_start[sl], W=2 * W,
                                 interpret=interpret)
        if qtile:
            # q-side shared-tile gather: the native seeder's hit stream
            # is query-position-sorted, so one small tile DMA serves 128
            # consecutive rows (the per-row DMA issue/extract is the
            # first window's dominant fixed cost — DESIGN round-5
            # roofline correction). The dispatcher verified every
            # block's span (gather_qtile_spans_ok).
            q2 = gather_rows_qtile(q2d, q_start[sl], W=2 * W,
                                   interpret=interpret)
        else:
            q2 = _gather_blocked(seq_q, q_start[sl], W=2 * W,
                                 interpret=interpret)
        return first_scan_pallas(
            r2, q2, loc_r[sl], loc_q[sl], valid[sl], sub_flat, xdrop,
            ref_len, query_len, W=W, BR=BR, interpret=interpret,
            with_counts=with_counts)

    outs = [slab(s) for s in range(0, B, _GATHER_MAX_ROWS)]
    if len(outs) == 1:
        out_r, out_l = outs[0]
    else:
        cat = lambda ds: {k: jnp.concatenate([d[k] for d in ds], axis=0)
                          for k in ds[0]}
        out_r = cat([o[0] for o in outs])
        out_l = cat([o[1] for o in outs])
    na_r = jnp.sum(jnp.logical_not(out_r["done"]).astype(jnp.int32))
    na_l = jnp.sum(jnp.logical_not(out_l["done"]).astype(jnp.int32))
    return (out_r, na_r), (out_l, na_l)


def _run_tail(seq_r, seq_q, loc_r, loc_q, st, n_alive, sub_flat, xdrop,
              ref_len, query_len, *, pad, W, CONT, left, engine,
              W_CONT=0, UNROLL=4, with_counts=True):
    """Continue one direction after its first window: full-batch stepping
    while > CONT rows live, then a compacted continuation at width W_CONT
    (defaults to W).

    Wider continuation windows amortize both the per-iteration pipeline
    stall of the data-dependent while_loop and the per-row DMA issue cost:
    rows that survive the first window are long homologous extensions
    (thousands of bases), so fewer/wider windows win. Requires
    pad >= W_CONT (left-gather lower bound)."""
    Wc = W_CONT or W
    B = loc_r.shape[0]
    if B <= CONT:
        # batch already fits the continuation width: no initial compaction
        return _cont_cascade(seq_r, seq_q, loc_r, loc_q, st, jnp.int32(W),
                             n_alive, sub_flat, xdrop, ref_len, query_len,
                             pad=pad, Wc=Wc, UNROLL=UNROLL, left=left,
                             engine=engine, sizes=_cascade_sizes(B),
                             with_counts=with_counts)

    # graduated rounds: while any rows live, compact the first CONT of
    # them to the front, run them to completion at width Wc, merge back.
    # Cost is alive-linear per round (the previous full-batch "phase 2"
    # stepping was B-linear PER WINDOW, which at B >= 2^18 made candidate
    # -dense chunks quadratically expensive). Scheduling only — each row's
    # extension is independent, so results are bit-identical.
    def round_cond(c):
        return c[1] > 0

    def round_body(c):
        st, na = c
        tgt, cum = _alive_prefix(st["done"], CONT)
        take = lambda a: jnp.take(a, tgt, axis=0)
        c_lr, c_lq = take(loc_r), take(loc_q)
        cst = {kk: take(st[kk]) for kk in _STATE}
        cohort = jnp.minimum(na, CONT)
        cst = _cont_cascade(seq_r, seq_q, c_lr, c_lq, cst, jnp.int32(W),
                            cohort, sub_flat, xdrop, ref_len, query_len,
                            pad=pad, Wc=Wc, UNROLL=UNROLL, left=left,
                            engine=engine, sizes=_cascade_sizes(CONT),
                            with_counts=with_counts)
        return (_merge_back(cst, st, cum, CONT), na - cohort)

    st, _ = jax.lax.while_loop(round_cond, round_body, (st, n_alive))
    return st


def _extend_core(ref_pad, query_pad, ref_loc, query_loc, valid, sub_flat,
                 xdrop, hspthresh, ref_len, query_len, *, pad, W, CONT,
                 engine, W_CONT=0, UNROLL=4, with_counts=True, q2d=None,
                 qtile=False, r2d=None, rtile=False):
    if qtile or rtile:
        # qtile requires monotone (sorted) q gather addresses: the
        # dispatcher pre-fills invalid suffix rows with the last valid
        # locations, so the raw buffers are safe gather addresses and
        # keep the sorted order (zeroing them would break both)
        loc_r = jnp.asarray(ref_loc, jnp.int32)
        loc_q = jnp.asarray(query_loc, jnp.int32)
    else:
        loc_r = jnp.where(valid, jnp.asarray(ref_loc, jnp.int32), 0)
        loc_q = jnp.where(valid, jnp.asarray(query_loc, jnp.int32), 0)
    B = loc_r.shape[0]

    def init_st(init_maxp):
        z = jnp.zeros((B,), jnp.int32)
        return dict(done=jnp.logical_not(valid), cum=z, maxv=z,
                    maxp=jnp.full((B,), init_maxp, jnp.int32),
                    counts=jnp.zeros((B, 4), jnp.int32),
                    cdel=jnp.zeros((B, 4), jnp.int32))

    # both directions run independently from zero counts (the counts fold
    # is additive in its initial value); the right direction's counts are
    # added back at finalize. This lets the Pallas path share one first
    # -window gather between the directions.
    if engine in ("pallas", "pallas_interpret"):
        (st_r0, na_r), (st_l0, na_l) = _first_steps_pallas(
            ref_pad, query_pad, loc_r, loc_q, init_st(-1), init_st(0),
            sub_flat, xdrop, ref_len, query_len, pad=pad, W=W,
            interpret=engine == "pallas_interpret",
            with_counts=with_counts, q2d=q2d, qtile=qtile, r2d=r2d,
            rtile=rtile)
    else:
        st_r0, na_r = _step(ref_pad, query_pad, loc_r, loc_q,
                            jnp.int32(0), init_st(-1), sub_flat, xdrop,
                            ref_len, query_len, pad=pad, W=W, left=False,
                            engine=engine, with_counts=with_counts)
        st_l0, na_l = _step(ref_pad, query_pad, loc_r, loc_q,
                            jnp.int32(0), init_st(0), sub_flat, xdrop,
                            ref_len, query_len, pad=pad, W=W, left=True,
                            engine=engine, with_counts=with_counts)
    kw = dict(pad=pad, W=W, CONT=CONT, engine=engine, W_CONT=W_CONT,
              UNROLL=UNROLL, with_counts=with_counts)
    if _USE_JOINT_TAIL:
        st_r, st_l = _run_tails_joint(
            ref_pad, query_pad, loc_r, loc_q, st_r0, na_r, st_l0, na_l,
            sub_flat, xdrop, ref_len, query_len, **kw)
    else:
        st_r = _run_tail(ref_pad, query_pad, loc_r, loc_q, st_r0, na_r,
                         sub_flat, xdrop, ref_len, query_len, left=False,
                         **kw)
        st_l = _run_tail(ref_pad, query_pad, loc_r, loc_q, st_l0, na_l,
                         sub_flat, xdrop, ref_len, query_len, left=True,
                         **kw)
    return _finalize.__wrapped__(valid, loc_r, loc_q, st_r["maxv"],
                                 st_r["maxp"], st_l["maxv"], st_l["maxp"],
                                 st_r["counts"] + st_l["counts"],
                                 hspthresh)


@functools.partial(jax.jit, static_argnames=("pad", "W", "CONT", "engine",
                                             "W_CONT", "UNROLL",
                                             "with_counts"))
def extend_program(ref_pad, query_pad, ref_loc, query_loc, valid, sub_flat,
                   xdrop, hspthresh, ref_len, query_len, *, pad: int,
                   W: int = 256, CONT: int = 4096, engine: str = "xla",
                   W_CONT: int = 0, UNROLL: int = 4,
                   with_counts: bool = True):
    """Extend a hit batch to completion in ONE device program.

    Same contract as ops/extend3.extend_hits_windowed but fully jitted:
    returns dict(candidate, rs, qs, length, total, counts)."""
    return _extend_core(ref_pad, query_pad, ref_loc, query_loc, valid,
                        sub_flat, xdrop, hspthresh, ref_len, query_len,
                        pad=pad, W=W, CONT=CONT, engine=engine,
                        W_CONT=W_CONT, UNROLL=UNROLL,
                        with_counts=with_counts)


@functools.partial(jax.jit,
                   static_argnames=("pad", "W", "CONT", "engine",
                                    "W_CONT", "UNROLL", "with_counts",
                                    "qtile", "rtile"))
def extend_fields_program(ref_pad, query_pad, ref_loc, query_loc, m,
                          sub_flat, xdrop, hspthresh, ref_len, query_len,
                          q2d=None, r2d=None, *, pad: int, W: int = 256,
                          CONT: int = 4096, engine: str = "xla",
                          W_CONT: int = 0, UNROLL: int = 4,
                          with_counts: bool = True, qtile: bool = False,
                          rtile: bool = False):
    """Extend rows [0, m) of an HBUF-sized hit batch; return the raw
    finalize fields dict(candidate, rs, qs, length, total, counts) as
    device arrays. Candidate compaction happens once per chunk-strand
    across ALL programs (pipeline/device._pack_compact), not per program:
    one global argsort replaces P per-program ones and removes the
    per-program overflow case entirely.

    qtile selects the shared-tile q-side first-window gather (sorted
    hits; q2d is the (rows, 128) padded query view). The dispatcher
    decides per program via gather_qtile_spans_ok."""
    B = ref_loc.shape[0]
    valid = jnp.arange(B, dtype=jnp.int32) < m
    return _extend_core(ref_pad, query_pad, ref_loc, query_loc, valid,
                        sub_flat, xdrop, hspthresh, ref_len, query_len,
                        pad=pad, W=W, CONT=CONT, engine=engine,
                        W_CONT=W_CONT, UNROLL=UNROLL,
                        with_counts=with_counts, q2d=q2d, qtile=qtile,
                        r2d=r2d, rtile=rtile)


@functools.partial(jax.jit,
                   static_argnames=("pad", "W", "CONT", "CBUF", "engine",
                                    "W_CONT", "UNROLL"))
def extend_compact_program(ref_pad, query_pad, ref_loc, query_loc, m,
                           sub_flat, xdrop, hspthresh, ref_len, query_len,
                           *, pad: int, W: int = 256, CONT: int = 4096,
                           CBUF: int = 2048, engine: str = "xla",
                           W_CONT: int = 0, UNROLL: int = 4):
    """extend_program + on-device candidate compaction, minimizing D2H.

    Rows [0, m) of the HBUF-sized hit arrays are live. Returns
      n      — int32 candidate count (transfer is 4 bytes)
      packed — (CBUF, 9) int32: row_index, rs, qs, length, total,
               counts[4] — only rows [0, min(n, CBUF)) are
               meaningful. When n > CBUF the caller must fall back to
               extend_program for this range (rare; CBUF is sized above
               the per-program candidate tail).

    The on-device analog of compress_output + the D2H copy
    (/root/reference/src/seed_filter.cu:654-680,788): the reference also
    compacts before copying; round 1 shipped full buffers instead, which
    dominated wall time on a ~20 MB/s host<->device link.
    """
    B = ref_loc.shape[0]
    valid = jnp.arange(B, dtype=jnp.int32) < m
    fin = _extend_core(ref_pad, query_pad, ref_loc, query_loc, valid,
                       sub_flat, xdrop, hspthresh, ref_len, query_len,
                       pad=pad, W=W, CONT=CONT, engine=engine,
                       W_CONT=W_CONT, UNROLL=UNROLL)
    cand = fin["candidate"]
    n = jnp.sum(cand.astype(jnp.int32))
    # row-order compaction via cumsum selection (sort- and scatter-free;
    # row order is preserved so the host can split rows back into
    # logical batches)
    sel, _ = _alive_prefix(jnp.logical_not(cand), CBUF)
    sel = sel.astype(jnp.int32)
    take = lambda a: jnp.take(a, sel, axis=0)
    packed = jnp.concatenate([
        sel[:, None], take(fin["rs"])[:, None], take(fin["qs"])[:, None],
        take(fin["length"])[:, None], take(fin["total"])[:, None],
        take(fin["counts"])], axis=1)
    return n, packed
