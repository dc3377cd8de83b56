"""Microbench of candidate extension-path designs on the real chip.

Measures, in one process with interleaved repetitions (to separate true cost
from environment jitter):
  - row gathers: XLA vmap-dynamic_slice random vs sorted starts, and the
    Pallas DMA gather (ops/extend_pallas.gather_rows_pallas)
  - the fused window-scan Pallas kernel steady-state
  - a fully-fused expand+gather+scan program (XLA)
  - searchsorted / take costs at pipeline shapes
  - d2h transfer of packed candidate buffers

Run: python scripts/probe_extension.py [probe ...]
"""

import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, warm=2, iters=10):
    for _ in range(warm):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{label}: med {med*1000:.2f} ms  min {min(ts)*1000:.2f}  "
          f"max {max(ts)*1000:.2f}", flush=True)
    return med


SEQ_N = 1 << 26  # 64 MB reference arena
B = 1 << 15
rng = np.random.default_rng(0)


def probe_gather():
    seq = jnp.asarray(rng.integers(0, 4, SEQ_N).astype(np.uint8))
    starts_np = rng.integers(0, SEQ_N - 4096, B).astype(np.int32)
    starts = jnp.asarray(starts_np)
    starts_sorted = jnp.asarray(np.sort(starts_np))

    for W in (128, 512):
        @functools.partial(jax.jit, static_argnames=("W",))
        def g(seq, st, *, W):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(seq, (s,), (W,)))(st)
        bench(f"xla gather random B={B} W={W}",
              lambda W=W: g(seq, starts, W=W))
        bench(f"xla gather sorted B={B} W={W}",
              lambda W=W: g(seq, starts_sorted, W=W))

    @jax.jit
    def srt(st):
        return jnp.sort(st), jnp.argsort(st)
    bench(f"sort+argsort B={B}", lambda: srt(starts))

    # one-hot matmul gather: seq reshaped (SEQ_N/128, 128); row fetch via
    # take on first axis is a contiguous row gather
    seq2d = seq.reshape(-1, 128)

    @jax.jit
    def g2d(st):
        row = st // 128
        rows = jnp.take(seq2d, row[:, None] + jnp.arange(2)[None, :], axis=0)
        return rows  # (B, 2, 128) aligned superset
    bench(f"2d row-take superset B={B} (2x128)", lambda: g2d(starts))

    try:
        from segalign_tpu.ops.extend_pallas import gather_rows_pallas
        bench(f"pallas DMA gather B={B} W=512",
              lambda: gather_rows_pallas(seq, starts, W=512))
        bench(f"pallas DMA gather sorted B={B} W=512",
              lambda: gather_rows_pallas(seq, starts_sorted, W=512))
    except Exception as e:
        print(f"pallas gather failed: {type(e).__name__}: {str(e)[:200]}")


def probe_scan_kernel():
    from segalign_tpu.ops.extend_pallas import window_scan_pallas
    W = 512
    r = jnp.asarray(rng.integers(0, 4, (B, W)).astype(np.int32))
    q = jnp.asarray(rng.integers(0, 4, (B, W)).astype(np.int32))
    inb = jnp.ones((B, W), jnp.int32)
    z = jnp.zeros((B,), jnp.int32)
    zc = jnp.zeros((B, 4), jnp.int32)
    sub = jnp.asarray(rng.integers(-114, 91, 64).astype(np.int32))
    done = jnp.zeros((B,), bool)
    bench(f"pallas window_scan B={B} W={W}",
          lambda: window_scan_pallas(r, q, inb, z, z, z, done, zc, zc, sub,
                                     910, 0, W=W, left=False))

    # XLA equivalent of the scan compute (no gather)
    @jax.jit
    def xla_scan(r, q, sub):
        sc = jnp.take(sub, r * 8 + q)
        ct = jnp.cumsum(sc, axis=1, dtype=jnp.int32)
        rm = jax.lax.cummax(ct, axis=1)
        drop = (rm - ct) > 910
        return ct[:, -1], jnp.max(rm, axis=1), jnp.any(drop, axis=1)
    bench(f"xla scan-only B={B} W={W}", lambda: xla_scan(r, q, sub))


def probe_searchsorted():
    S = 5 << 20
    cum = jnp.asarray(np.cumsum(
        rng.integers(0, 2, S).astype(np.int32)))
    g = jnp.asarray(np.sort(rng.integers(0, int(cum[-1]), B)).astype(np.int32))

    @jax.jit
    def ss(cum, g):
        return jnp.searchsorted(cum, g, side="right")
    bench(f"searchsorted S={S} B={B}", lambda: ss(cum, g))

    tbl = jnp.asarray(rng.integers(0, 1 << 20, 1 << 24).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 1 << 24, 5 << 20).astype(np.int32))

    @jax.jit
    def tk(tbl, idx):
        return jnp.take(tbl, idx)
    bench("take 5M random from 64MB table", lambda: tk(tbl, idx))
    idx_s = jnp.asarray(np.sort(np.asarray(idx)))
    bench("take 5M sorted from 64MB table", lambda: tk(tbl, idx_s))


def probe_d2h():
    for shape in ((B, 8), (1 << 20,)):
        x = jnp.ones(shape, jnp.int32)
        jax.block_until_ready(x)
        bench(f"device_get {shape}", lambda x=x: jax.device_get(x))
    xs = [jnp.ones((B,), jnp.int32) for _ in range(6)]
    jax.block_until_ready(xs)
    bench("device_get 6 separate (B,) arrays", lambda: jax.device_get(xs))


def probe_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    bench("tiny xla", lambda: f(x))
    big = jnp.ones((1 << 13, 512), jnp.int32)
    gbig = jax.jit(lambda b: (b * 2 + 1).sum(axis=1))
    bench("mid xla (8192,512) mul+sum", lambda: gbig(big))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    @jax.jit
    def ptiny(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    bench("tiny pallas", lambda: ptiny(x))
    bench("tiny xla again", lambda: f(x))


def probe_scan2():
    """Decompose the window-scan cost at (B, W) pipeline shapes."""
    for W in (128, 512):
        r = jnp.asarray(rng.integers(0, 4, (B, W)).astype(np.int32))
        q = jnp.asarray(rng.integers(0, 4, (B, W)).astype(np.int32))
        sub = jnp.asarray(rng.integers(-114, 91, 64).astype(np.int32))

        bench(f"take64 lookup (B,{W})",
              lambda r=r, q=q: jax.jit(lambda r, q: jnp.take(sub, r * 8 + q))(r, q))
        sc = jnp.asarray(rng.integers(-114, 91, (B, W)).astype(np.int32))
        bench(f"cumsum axis1 (B,{W}) i32",
              lambda sc=sc: jax.jit(lambda x: jnp.cumsum(x, axis=1))(sc))
        bench(f"cummax axis1 (B,{W}) i32",
              lambda sc=sc: jax.jit(lambda x: jax.lax.cummax(x, axis=1))(sc))
        scf = sc.astype(jnp.float32)
        bench(f"cumsum axis1 (B,{W}) f32",
              lambda scf=scf: jax.jit(lambda x: jnp.cumsum(x, axis=1))(scf))
        bench(f"assoc_scan add (B,{W}) i32",
              lambda sc=sc: jax.jit(
                  lambda x: jax.lax.associative_scan(jnp.add, x, axis=1))(sc))
        tri = jnp.tril(jnp.ones((W, W), jnp.bfloat16))
        bench(f"matmul-cumsum (B,{W}) bf16",
              lambda sc=sc, tri=tri: jax.jit(
                  lambda x, t: jnp.dot(x.astype(jnp.bfloat16), t,
                                       preferred_element_type=jnp.float32))(sc, tri))

        @jax.jit
        def full_scan(r, q, sub):
            sc = jnp.take(sub, r * 8 + q)
            ct = jnp.cumsum(sc, axis=1, dtype=jnp.int32)
            rm = jax.lax.cummax(ct, axis=1)
            drop = (rm - ct) > 910
            return ct[:, -1], jnp.max(rm, axis=1), jnp.any(drop, axis=1)
        bench(f"full scan (B,{W})", lambda r=r, q=q: full_scan(r, q, sub))


PROBES = dict(gather=probe_gather, scan=probe_scan_kernel,
              searchsorted=probe_searchsorted, d2h=probe_d2h, scan2=probe_scan2,
              overhead=probe_overhead)

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        print(f"--- {n} ---", flush=True)
        try:
            PROBES[n]()
        except Exception as e:
            print(f"probe {n} CRASHED: {type(e).__name__}: {str(e)[:300]}")
