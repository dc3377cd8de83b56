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

import jax
import jax.numpy as jnp

from .extend3 import _finalize, window_step_fn

_STATE = ("done", "cum", "maxv", "maxp", "counts", "cdel")


def _step(seq_r, seq_q, loc_r, loc_q, k, st, sub_flat, xdrop, ref_len,
          query_len, *, pad, W, left):
    out = window_step_fn().__wrapped__(
        seq_r, seq_q, loc_r, loc_q, k, st["done"], st["cum"], st["maxv"],
        st["maxp"], st["counts"], st["cdel"], sub_flat, xdrop, ref_len,
        query_len, pad=pad, W=W, left=left)
    n_alive = out.pop("n_alive")
    return out, n_alive


def _run_dir(seq_r, seq_q, loc_r, loc_q, valid, sub_flat, xdrop, ref_len,
             query_len, init_maxp, counts0, *, pad, W, CONT, left):
    B = loc_r.shape[0]
    z = jnp.zeros((B,), jnp.int32)
    st = dict(done=jnp.logical_not(valid), cum=z, maxv=z,
              maxp=jnp.full((B,), init_maxp, jnp.int32), counts=counts0,
              cdel=jnp.zeros((B, 4), jnp.int32))
    st, n_alive = _step(seq_r, seq_q, loc_r, loc_q, jnp.int32(0), st,
                        sub_flat, xdrop, ref_len, query_len, pad=pad, W=W,
                        left=left)

    if B <= CONT:
        # batch fits the continuation width: plain full-batch while_loop
        def cond(c):
            _, _, na = c
            return na > 0

        def body(c):
            k, s, _ = c
            s2, na = _step(seq_r, seq_q, loc_r, loc_q, k, s, sub_flat,
                           xdrop, ref_len, query_len, pad=pad, W=W,
                           left=left)
            return k + 1, s2, na

        _, st, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(1), st, n_alive))
        return st

    # phase 2: full-batch stepping while > CONT rows live
    def cond_full(c):
        _, _, na = c
        return na > CONT

    def body_full(c):
        k, s, _ = c
        s2, na = _step(seq_r, seq_q, loc_r, loc_q, k, s, sub_flat, xdrop,
                       ref_len, query_len, pad=pad, W=W, left=left)
        return k + 1, s2, na

    k, st, n_alive = jax.lax.while_loop(
        cond_full, body_full, (jnp.int32(1), st, n_alive))

    # phase 3: compact live rows to the front (stable: extend3._alive_order)
    order = jnp.argsort(st["done"], stable=True)
    inv = jnp.argsort(order, stable=True)
    prefix = order[:CONT]
    take = lambda a: jnp.take(a, prefix, axis=0)
    c_lr, c_lq = take(loc_r), take(loc_q)
    cst = {kk: take(st[kk]) for kk in _STATE}

    def cond_c(c):
        _, _, na = c
        return na > 0

    def body_c(c):
        k, s, _ = c
        s2, na = _step(seq_r, seq_q, c_lr, c_lq, k, s, sub_flat, xdrop,
                       ref_len, query_len, pad=pad, W=W, left=left)
        return k + 1, s2, na

    _, cst, _ = jax.lax.while_loop(cond_c, body_c, (k, cst, n_alive))

    # phase 4: merge back (sorted-space concat then unsort; gather-only)
    def merge(c, full):
        rest = jnp.take(full, order[CONT:], axis=0)
        return jnp.take(jnp.concatenate([c, rest], axis=0), inv, axis=0)

    return {kk: merge(cst[kk], st[kk]) for kk in _STATE}


def _extend_core(ref_pad, query_pad, ref_loc, query_loc, valid, sub_flat,
                 xdrop, hspthresh, ref_len, query_len, *, pad, W, CONT):
    loc_r = jnp.where(valid, jnp.asarray(ref_loc, jnp.int32), 0)
    loc_q = jnp.where(valid, jnp.asarray(query_loc, jnp.int32), 0)
    B = loc_r.shape[0]
    zc = jnp.zeros((B, 4), jnp.int32)
    st_r = _run_dir(ref_pad, query_pad, loc_r, loc_q, valid, sub_flat,
                    xdrop, ref_len, query_len, -1, zc, pad=pad, W=W,
                    CONT=CONT, left=False)
    st_l = _run_dir(ref_pad, query_pad, loc_r, loc_q, valid, sub_flat,
                    xdrop, ref_len, query_len, 0, st_r["counts"], pad=pad,
                    W=W, CONT=CONT, left=True)
    return _finalize.__wrapped__(valid, loc_r, loc_q, st_r["maxv"],
                                 st_r["maxp"], st_l["maxv"], st_l["maxp"],
                                 st_l["counts"], hspthresh)


@functools.partial(jax.jit, static_argnames=("pad", "W", "CONT"))
def extend_program(ref_pad, query_pad, ref_loc, query_loc, valid, sub_flat,
                   xdrop, hspthresh, ref_len, query_len, *, pad: int,
                   W: int = 256, CONT: int = 4096):
    """Extend a hit batch to completion in ONE device program.

    Same contract as ops/extend3.extend_hits_windowed but fully jitted:
    returns dict(candidate, rs, qs, length, total, counts)."""
    return _extend_core(ref_pad, query_pad, ref_loc, query_loc, valid,
                        sub_flat, xdrop, hspthresh, ref_len, query_len,
                        pad=pad, W=W, CONT=CONT)


@functools.partial(jax.jit,
                   static_argnames=("pad", "W", "CONT", "CBUF"))
def extend_compact_program(ref_pad, query_pad, ref_loc, query_loc, m,
                           sub_flat, xdrop, hspthresh, ref_len, query_len,
                           *, pad: int, W: int = 256, CONT: int = 4096,
                           CBUF: int = 2048):
    """extend_program + on-device candidate compaction, minimizing D2H.

    Rows [0, m) of the HBUF-sized hit arrays are live. Returns
      n      — int32 candidate count (transfer is 4 bytes)
      packed — (CBUF, 9) int32: row_index, rs, qs, length, total,
               counts[4] — only rows [0, min(n, CBUF)) are meaningful. When n > CBUF the caller must fall back to
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
                       pad=pad, W=W, CONT=CONT)
    cand = fin["candidate"]
    n = jnp.sum(cand.astype(jnp.int32))
    # stable compaction via argsort (TPU scatter is slow); row order is
    # preserved so the host can split rows back into logical batches
    perm = jnp.argsort(jnp.logical_not(cand), stable=True)
    sel = perm[:CBUF].astype(jnp.int32)
    take = lambda a: jnp.take(a, sel, axis=0)
    packed = jnp.concatenate([
        sel[:, None], take(fin["rs"])[:, None], take(fin["qs"])[:, None],
        take(fin["length"])[:, None], take(fin["total"])[:, None],
        take(fin["counts"])], axis=1)
    return n, packed
