"""Cost of the compaction primitives inside the fused program at B=2^18:
full stable argsort (current _run_tail/_pack_compact) vs blocked-cumsum +
searchsorted prefix selection (candidate replacement)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 1 << 18
CONT = 4096
rng = np.random.default_rng(0)
done_np = np.ones(B, bool)
done_np[rng.choice(B, 3200, replace=False)] = False
done = jax.device_put(done_np)
state = jax.device_put(rng.integers(0, 1 << 20, B).astype(np.int32))


def dep0(acc):
    return jnp.where(acc == jnp.int32(-2147483647), jnp.int32(1),
                     jnp.int32(0))


def measure(label, fn, lo=2, hi=10):
    jax.device_get(fn(lo))
    ts = {}
    for reps in (lo, hi, lo, hi):
        t0 = time.time()
        jax.device_get(fn(reps))
        ts.setdefault(reps, []).append(time.time() - t0)
    per = (min(ts[hi]) - min(ts[lo])) / (hi - lo)
    print(f"{label:40s} {per*1000:8.3f} ms", flush=True)


@functools.partial(jax.jit, static_argnames=("reps",))
def argsort2(reps, done, state):
    def body(i, acc):
        d = jnp.logical_xor(done, dep0(acc) != 0)
        order = jnp.argsort(d, stable=True)
        inv = jnp.argsort(order, stable=True)
        prefix = order[:CONT]
        c = jnp.take(state, prefix)
        rest = jnp.take(state, order[CONT:])
        merged = jnp.take(jnp.concatenate([c, rest]), inv)
        return acc + merged[0] + c[0]
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("reps",))
def cumsum_sel(reps, done, state):
    from segalign_tpu.ops.scan_utils import blocked_cumsum
    def body(i, acc):
        d = jnp.logical_xor(done, dep0(acc) != 0)
        alive = jnp.logical_not(d).astype(jnp.int32)
        cum = blocked_cumsum(alive)
        tgt = jnp.searchsorted(
            cum, jnp.arange(1, CONT + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        tgt = jnp.minimum(tgt, B - 1)
        c = jnp.take(state, tgt)
        rank = jnp.clip(cum - 1, 0, CONT - 1)
        sel = jnp.logical_not(d) & (cum <= CONT)
        merged = jnp.where(sel, jnp.take(c, rank), state)
        return acc + merged[0] + c[0]
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("reps",))
def argsort_only(reps, done, state):
    def body(i, acc):
        d = jnp.logical_xor(done, dep0(acc) != 0)
        order = jnp.argsort(d, stable=True)
        return acc + order[0]
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("reps",))
def gather_b(reps, done, state):
    def body(i, acc):
        idx = jnp.arange(B, dtype=jnp.int32) + dep0(acc)
        return acc + jnp.take(state, idx)[0]
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


for name, fn in [("argsort_only (1 sort)", argsort_only),
                 ("argsort compaction (2 sorts+merge)", argsort2),
                 ("cumsum+searchsorted compaction", cumsum_sel),
                 ("plain B-gather", gather_b)]:
    measure(name, lambda reps, fn=fn: fn(reps, done, state))
