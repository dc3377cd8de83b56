"""Probe the TPU environment's dispatch/compile behavior.

Round-1 documented several axon-tunnel pathologies (docs/DESIGN.md):
multi-minute while_loop compiles, fused-program miscompiles, 10-100x
composite-program slowdowns, per-dispatch latency ~10-100 ms. This script
re-measures each so round-2 optimization decisions rest on current data.

Run: python scripts/probe_env.py [probe ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn, warm=1, iters=5, sync=True):
    for _ in range(warm):
        out = fn()
        if sync:
            jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
        if sync:
            jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:.2f} ms", flush=True)
    return dt


def probe_dispatch():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    t("tiny-op sync dispatch", lambda: f(x))

    def chain20():
        y = x
        for _ in range(20):
            y = f(y)
        return y
    t("20 chained tiny dispatches + 1 sync", chain20)

    g = jax.jit(lambda x: ((x * 2 + 1).sum()))
    t("tiny-reduce sync dispatch", lambda: g(x))


def probe_d2h():
    for n in (4, 1 << 14, 1 << 20):
        x = jnp.ones((n,), jnp.int32)
        jax.block_until_ready(x)
        t(f"device_get {n} int32", lambda x=x: np.asarray(jax.device_get(x)))


def probe_while():
    # small while_loop: does it still take minutes to compile?
    def body(c):
        i, x = c
        return i + 1, x * 1.000001 + 0.5

    @jax.jit
    def f(x):
        return jax.lax.while_loop(lambda c: c[0] < 100, body, (0, x))[1]

    x = jnp.ones((256, 512), jnp.float32)
    t0 = time.time()
    jax.block_until_ready(f(x))
    print(f"while_loop(100) compile+run: {time.time()-t0:.1f} s", flush=True)
    t("while_loop(100) steady", lambda: f(x))


def probe_scan():
    # fori over 8 windows of the real window-step-like compute, one program
    W, B = 512, 8192

    @jax.jit
    def f(r, q, sub):
        def step(k, carry):
            cum, mx = carry
            sc = jnp.take(sub, r * 8 + q)
            ct = jnp.cumsum(sc, axis=1) + cum[:, None]
            rm = jax.lax.cummax(ct, axis=1)
            return ct[:, -1], jnp.maximum(mx, rm[:, -1])
        return jax.lax.fori_loop(0, 8, step, (jnp.zeros(B, jnp.int32),
                                              jnp.zeros(B, jnp.int32)))

    r = jnp.zeros((B, W), jnp.int32)
    q = jnp.zeros((B, W), jnp.int32)
    sub = jnp.zeros(64, jnp.int32)
    t0 = time.time()
    jax.block_until_ready(f(r, q, sub))
    print(f"fori(8) window-ish compile+run: {time.time()-t0:.1f} s",
          flush=True)
    t("fori(8) window-ish steady", lambda: f(r, q, sub))


def probe_fused():
    """Fused expand+extend-like program vs split (round-1 claimed the fused
    form miscompiled and composites ran 10-100x slower than parts)."""
    HBUF, W = 1 << 15, 512
    N = 1 << 22
    seq = jnp.zeros((N,), jnp.uint8)
    cum = jnp.arange(1, (1 << 18) + 1, dtype=jnp.int32)
    pos_table = jnp.zeros((1 << 20,), jnp.int32)
    sub = jnp.zeros(64, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("HBUF",))
    def expand(cum, pos_table, g0, *, HBUF):
        g = g0 + jnp.arange(HBUF, dtype=jnp.int32)
        sidx = jnp.searchsorted(cum, g, side="right").astype(jnp.int32)
        sidx = jnp.minimum(sidx, cum.shape[0] - 1)
        bp = jnp.clip(jnp.take(cum, sidx), 0, pos_table.shape[0] - 1)
        return jnp.take(pos_table, bp), sidx

    @functools.partial(jax.jit, static_argnames=("W",))
    def extend1(seq, loc, sub, *, W):
        r = jax.vmap(lambda s: jax.lax.dynamic_slice(seq, (s,), (W,)))(
            loc).astype(jnp.int32)
        sc = jnp.take(sub, r * 9)
        ct = jnp.cumsum(sc, axis=1)
        return jnp.max(jax.lax.cummax(ct, axis=1), axis=1)

    @functools.partial(jax.jit, static_argnames=("HBUF", "W"))
    def fused(seq, cum, pos_table, sub, g0, *, HBUF, W):
        loc, sidx = expand.__wrapped__(cum, pos_table, g0, HBUF=HBUF)
        return extend1.__wrapped__(seq, loc, sub, W=W)

    g0 = jnp.int32(0)
    t0 = time.time()
    loc, sidx = expand(cum, pos_table, g0, HBUF=HBUF)
    jax.block_until_ready(loc)
    print(f"expand compile: {time.time()-t0:.1f} s", flush=True)
    t0 = time.time()
    jax.block_until_ready(extend1(seq, loc, sub, W=W))
    print(f"extend compile: {time.time()-t0:.1f} s", flush=True)
    t0 = time.time()
    try:
        jax.block_until_ready(fused(seq, cum, pos_table, sub, g0,
                                    HBUF=HBUF, W=W))
        print(f"fused compile+run OK: {time.time()-t0:.1f} s", flush=True)
        t("fused steady", lambda: fused(seq, cum, pos_table, sub, g0,
                                        HBUF=HBUF, W=W))
    except Exception as e:
        print(f"fused FAILED: {type(e).__name__}: {str(e)[:200]}")
    a = t("split steady (expand)", lambda: expand(cum, pos_table, g0,
                                                  HBUF=HBUF))
    b = t("split steady (extend)", lambda: extend1(seq, loc, sub, W=W))
    print(f"split sum: {(a+b)*1000:.2f} ms", flush=True)


def probe_pallas():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((256, 512), jnp.float32)
    t0 = time.time()
    jax.block_until_ready(f(x))
    print(f"pallas tiny compile+run: {time.time()-t0:.1f} s", flush=True)
    t("pallas tiny steady", lambda: f(x))


PROBES = dict(dispatch=probe_dispatch, d2h=probe_d2h, while_=probe_while,
              scan=probe_scan, fused=probe_fused, pallas=probe_pallas)

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        print(f"--- {n} ---", flush=True)
        t0 = time.time()
        try:
            PROBES[n]()
        except Exception as e:
            print(f"probe {n} CRASHED: {type(e).__name__}: {str(e)[:300]}")
        print(f"({n}: {time.time()-t0:.1f} s total)", flush=True)
