"""Microbenchmark: row-gather strategies for the extension window fetch.

The round-2 profile puts the shared (B, 2W) row-gather at ~half of each
extension program (~85 ns/row in gather_rows_pallas: per-row DMA
issue/wait + aligned-superset rotate).  This sweeps the candidate
replacements on the attached device with the fori-loop-repetition
methodology (the only timing that survives the tunnel's noise):

  pallas_rand    gather_rows_pallas, random starts (production today)
  pallas_sort    gather_rows_pallas, sorted starts (DMA locality)
  xla_rand       vmap dynamic_slice, random starts
  xla_sort       vmap dynamic_slice, sorted starts

Usage: python scripts/microbench_gather.py [inner_reps] [outer_reps]
Env:   GB_B=131072 GB_W=512
"""

import os
import sys
import time

import numpy as np


def main():
    inner = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outer = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    B = int(os.environ.get("GB_B", 131072))
    W = int(os.environ.get("GB_W", 512))

    import jax
    import jax.numpy as jnp
    import functools
    from segalign_tpu.ops.extend_pallas import gather_rows_pallas, awin_for

    dev = jax.devices()[0]
    print(f"device={dev.platform} B={B} W={W} inner={inner}",
          file=sys.stderr)

    rng = np.random.default_rng(7)
    n = 1_000_000
    AW = awin_for(W)
    seq = rng.integers(0, 4, n + AW + 8192).astype(np.uint8)
    starts = rng.integers(0, n, B).astype(np.int32)
    d_seq = jax.device_put(seq, dev)
    d_rand = jax.device_put(starts, dev)
    d_sort = jax.device_put(np.sort(starts), dev)

    # full-reduction accumulator: every gathered element feeds the result,
    # so no iteration (or element) can be dead-code-eliminated; starts are
    # perturbed per iteration to defeat CSE/hoisting
    @functools.partial(jax.jit, static_argnames=("reps",))
    def pallas_loop(seq_pad, st, *, reps):
        def body(i, acc):
            r = gather_rows_pallas(seq_pad, st + i, W=W)
            return acc + jnp.sum(r, dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("reps",))
    def xla_loop(seq_pad, st, *, reps):
        def gather(s):
            return jax.vmap(
                lambda x: jax.lax.dynamic_slice(seq_pad, (x,), (W,)))(
                    s).astype(jnp.int32)

        def body(i, acc):
            r = gather(st + i)
            return acc + jnp.sum(r, dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    cases = [
        ("pallas_rand", pallas_loop, d_rand),
        ("pallas_sort", pallas_loop, d_sort),
        ("xla_rand", xla_loop, d_rand),
        ("xla_sort", xla_loop, d_sort),
    ]
    for name, fn, st in cases:
        t0 = time.time()
        # device_get forces real completion: block_until_ready does not
        # actually block on the axon backend
        jax.device_get(fn(d_seq, st, reps=1))
        compile_s = time.time() - t0
        jax.device_get(fn(d_seq, st, reps=inner))  # compile N-variant
        # net per-call: (T(inner) - T(1)) / (inner - 1); the link RTT and
        # fixed program overhead cancel in the difference
        ts1, tsN = [], []
        for _ in range(outer):
            t0 = time.time()
            jax.device_get(fn(d_seq, st, reps=1))
            ts1.append(time.time() - t0)
            t0 = time.time()
            jax.device_get(fn(d_seq, st, reps=inner))
            tsN.append(time.time() - t0)
        t1 = np.median(ts1)
        tN = np.median(tsN)
        per = (tN - t1) / (inner - 1)
        print(f"{name:12s} compile={compile_s:6.1f}s one={t1*1000:8.2f}ms "
              f"net_per_call={per*1000:8.2f}ms ns_per_row={per/B*1e9:7.1f}",
              flush=True)


if __name__ == "__main__":
    main()
