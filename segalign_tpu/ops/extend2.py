"""Two-phase x-drop extension (fast path).

Phase 1 processes every hit against a fixed window of LW bases left and RW
bases right of the anchor in ONE dense pass (no data-dependent loop): the
scan-form semantics (oracle/scan_spec.py) make any tiling of the reference's
tile-32 algorithm equivalent, so a hit whose extension terminates (x-drop or
sequence edge) inside the window is final. Terminating hits are the vast
majority (a drop needs ~10 mismatches under default scoring); the rest fall
back to the unbounded while-loop path (ops/extend.py) and the results merge.

Entropy match counts come for free from the already-gathered windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .extend import extend_hits, _gather_windows

NEG = jnp.int32(-(2**31) + 1)


def _phase1_direction(seq_r_pad, seq_q_pad, loc_r, loc_q, sub_flat, xdrop,
                      ref_len, query_len, pad, W, left: bool):
    """Single-window scan for one direction.

    Returns (finished, maxv, maxp, match_codes) where maxp follows the
    reference convention (right: 0-based anchor-inclusive, -1 if none;
    left: 1-based count, 0 if none) and match_codes is the (B, W) int32
    array of codes at matching in-window positions (-1 where no match),
    used for entropy counts."""
    B = loc_r.shape[0]
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]

    if left:
        p = lanes + 1                      # positions 1..W before the anchor
        r = _gather_windows(seq_r_pad, pad + loc_r - W, W)[:, ::-1]
        q = _gather_windows(seq_q_pad, pad + loc_q - W, W)[:, ::-1]
        inb = (loc_r[:, None] >= p) & (loc_q[:, None] >= p)
        lim = jnp.minimum(loc_r, loc_q)    # number of available positions
    else:
        p = lanes                          # positions 0..W-1 from the anchor
        r = _gather_windows(seq_r_pad, pad + loc_r, W)
        q = _gather_windows(seq_q_pad, pad + loc_q, W)
        inb = ((loc_r[:, None] + p) < ref_len) & \
              ((loc_q[:, None] + p) < query_len)
        lim = jnp.minimum(ref_len - loc_r, query_len - loc_q)

    sc = jnp.where(inb, jnp.take(sub_flat, r * 8 + q), 0)
    cum = jnp.cumsum(sc, axis=1, dtype=jnp.int32)
    runmax = jnp.maximum(jax.lax.cummax(cum, axis=1), 0)
    drop = (runmax - cum) > xdrop
    anydrop = jnp.any(drop, axis=1)
    d = jnp.where(anydrop, jnp.argmax(drop, axis=1).astype(jnp.int32), W)
    before = lanes < d[:, None]

    Mv = jnp.maximum(jnp.max(jnp.where(before, cum, NEG), axis=1), 0)
    has = Mv > 0
    j = jnp.argmax((cum == Mv[:, None]) & before, axis=1).astype(jnp.int32)
    if left:
        Mp = jnp.where(has, j + 1, 0)
    else:
        Mp = jnp.where(has, j, -1)

    finished = anydrop | (lim < W)
    match_codes = jnp.where(inb & (r == q) & (r < 4), r, -1)
    return finished, Mv, Mp, match_codes, p


@functools.partial(jax.jit, static_argnames=("pad", "W", "LW", "RW"))
def extend_hits_twophase(ref_pad, query_pad, ref_loc, query_loc, valid,
                         sub_flat, xdrop, hspthresh, ref_len, query_len, *,
                         pad: int, W: int = 128, LW: int = 512,
                         RW: int = 512):
    """Drop-in replacement for extend_hits (same contract)."""
    ref_loc = ref_loc.astype(jnp.int32)
    query_loc = query_loc.astype(jnp.int32)
    safe_rl = jnp.where(valid, ref_loc, 0)
    safe_ql = jnp.where(valid, query_loc, 0)

    fin_r, rv, rp, mc_r, p_r = _phase1_direction(
        ref_pad, query_pad, safe_rl, safe_ql, sub_flat, xdrop, ref_len,
        query_len, pad, RW, left=False)
    fin_l, lv, lp, mc_l, p_l = _phase1_direction(
        ref_pad, query_pad, safe_rl, safe_ql, sub_flat, xdrop, ref_len,
        query_len, pad, LW, left=True)
    finished = fin_r & fin_l

    # entropy counts over the final extents (window positions <= maxp)
    in_r = p_r <= rp[:, None]
    in_l = p_l <= lp[:, None]
    codes = jnp.arange(4, dtype=jnp.int32)[None, None, :]
    counts1 = (
        jnp.sum((mc_r[:, :, None] == codes) & in_r[:, :, None], axis=1,
                dtype=jnp.int32) +
        jnp.sum((mc_l[:, :, None] == codes) & in_l[:, :, None], axis=1,
                dtype=jnp.int32))

    total1 = rv + lv
    res1 = dict(
        candidate=valid & finished & (total1 >= hspthresh),
        rs=safe_rl - lp, qs=safe_ql - lp, length=rp + lp, total=total1,
        counts=counts1)

    # phase 2: unbounded path for the few unfinished hits
    need_slow = valid & jnp.logical_not(finished)
    any_slow = jnp.any(need_slow)
    res2 = extend_hits(ref_pad, query_pad, ref_loc, query_loc, need_slow,
                       sub_flat, xdrop, hspthresh, ref_len, query_len,
                       pad=pad, W=W)

    out = {}
    for k in ("candidate", "rs", "qs", "length", "total"):
        out[k] = jnp.where(finished, res1[k], res2[k])
    out["counts"] = jnp.where(finished[:, None], res1["counts"],
                              res2["counts"])
    # invalid rows: match the while-loop extender's inert outputs exactly
    out["candidate"] = out["candidate"] & valid
    out["total"] = jnp.where(valid, out["total"], 0)
    out["length"] = jnp.where(valid, out["length"], -1)
    out["rs"] = jnp.where(valid, out["rs"], 0)
    out["qs"] = jnp.where(valid, out["qs"], 0)
    out["counts"] = jnp.where(valid[:, None], out["counts"], 0)
    return out
