"""Experiment: decompose gather_rows_pallas' 84 ns/row and test variants.

Variants (each a standalone kernel, NOT production code):
  v0_prod     production gather_rows_pallas (baseline)
  v1_dma      DMAs only, static extraction (wrong values; measures DMA cost)
  v2_rot      no DMAs, rotate-extract from scratch (measures extract cost)
  v3_dbuf     double-buffered: issue block t+1's DMAs before extracting t
  v4_fused    r+q in one kernel (shared grid/scalar loop, 2x rows per step)

Timing: fori-loop repetition + device_get of a scalar (the only honest
methodology here; block_until_ready does not block on the axon backend).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from segalign_tpu.ops.extend_pallas import (gather_rows_pallas, awin_for,
                                            ALIGN)

B = 131072
W = 512
BR = 256
AW = awin_for(W)


def _issue_all(starts_ref, seq_ref, buf, sems, base, bank, BR, AW):
    def dma(j):
        start = starts_ref[base + j]
        aligned = (start // ALIGN) * ALIGN
        return pltpu.make_async_copy(
            seq_ref.at[pl.ds(aligned, AW)],
            buf.at[pl.ds((bank * BR + j) * AW, AW)], sems.at[bank, j])

    def start_one(j, _):
        dma(j).start()
        return 0
    jax.lax.fori_loop(0, BR, start_one, 0)


def _wait_all(starts_ref, seq_ref, buf, sems, base, bank, BR, AW):
    def dma(j):
        start = starts_ref[base + j]
        aligned = (start // ALIGN) * ALIGN
        return pltpu.make_async_copy(
            seq_ref.at[pl.ds(aligned, AW)],
            buf.at[pl.ds((bank * BR + j) * AW, AW)], sems.at[bank, j])

    def wait_one(j, _):
        dma(j).wait()
        return 0
    jax.lax.fori_loop(0, BR, wait_one, 0)


def _extract(starts_ref, buf, out_ref, i, bank, BR, AW, W, rotate=True):
    def extract8(t, _):
        base = pl.multiple_of(t * 8, 8)
        rows = []
        for c in range(8):
            start = starts_ref[i * BR + base + c]
            off = start - (start // ALIGN) * ALIGN
            row = buf[pl.ds((bank * BR + base + c) * AW, AW)].reshape(1, AW)
            if rotate:
                rolled = pltpu.roll(row.astype(jnp.int32), AW - off, 1)
            else:
                rolled = row.astype(jnp.int32)
            rows.append(rolled[:, :W])
        out_ref[pl.ds(base, 8), :] = jnp.concatenate(rows, axis=0)
        return 0
    jax.lax.fori_loop(0, BR // 8, extract8, 0)


def _v1_kernel(starts_ref, seq_ref, out_ref, buf, sems):
    i = pl.program_id(0)
    _issue_all(starts_ref, seq_ref, buf, sems, i * BR, 0, BR, AW)
    _wait_all(starts_ref, seq_ref, buf, sems, i * BR, 0, BR, AW)
    _extract(starts_ref, buf, out_ref, i, 0, BR, AW, W, rotate=False)


def _v2_kernel(starts_ref, seq_ref, out_ref, buf, sems):
    i = pl.program_id(0)
    _extract(starts_ref, buf, out_ref, i, 0, BR, AW, W, rotate=True)


def _v3_kernel(starts_ref, seq_ref, out_ref, buf, sems):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        _issue_all(starts_ref, seq_ref, buf, sems, 0, 0, BR, AW)

    @pl.when(i + 1 < n)
    def _():
        _issue_all(starts_ref, seq_ref, buf, sems, (i + 1) * BR,
                   (i + 1) % 2, BR, AW)

    _wait_all(starts_ref, seq_ref, buf, sems, i * BR, i % 2, BR, AW)
    _extract(starts_ref, buf, out_ref, i, i % 2, BR, AW, W, rotate=True)


def _mk(kernel, banks):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BR,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BR, W), lambda i, starts: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((banks * BR * AW,), jnp.uint8),
                        pltpu.SemaphoreType.DMA((banks, BR))],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))


def _v4_kernel(starts2_ref, seqr_ref, seqq_ref, outr_ref, outq_ref, buf,
               sems):
    # starts2: (2B,) = [r starts | q starts]; one shared scalar loop
    i = pl.program_id(0)

    def dma(j, bank, seq_ref):
        start = starts2_ref[bank * B + i * BR + j]
        aligned = (start // ALIGN) * ALIGN
        return pltpu.make_async_copy(
            seq_ref.at[pl.ds(aligned, AW)],
            buf.at[pl.ds((bank * BR + j) * AW, AW)], sems.at[bank, j])

    def start_one(j, _):
        dma(j, 0, seqr_ref).start()
        dma(j, 1, seqq_ref).start()
        return 0
    jax.lax.fori_loop(0, BR, start_one, 0)

    def wait_one(j, _):
        dma(j, 0, seqr_ref).wait()
        dma(j, 1, seqq_ref).wait()
        return 0
    jax.lax.fori_loop(0, BR, wait_one, 0)

    def extract8(args, _):
        t = args

        def one(bank, out_ref):
            base = pl.multiple_of(t * 8, 8)
            rows = []
            for c in range(8):
                start = starts2_ref[bank * B + i * BR + base + c]
                off = start - (start // ALIGN) * ALIGN
                row = buf[pl.ds((bank * BR + base + c) * AW,
                                AW)].reshape(1, AW)
                rolled = pltpu.roll(row.astype(jnp.int32), AW - off, 1)
                rows.append(rolled[:, :W])
            out_ref[pl.ds(base, 8), :] = jnp.concatenate(rows, axis=0)
        one(0, outr_ref)
        one(1, outq_ref)
        return 0
    jax.lax.fori_loop(0, BR // 8, extract8, 0)


def _mk4():
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BR,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec((BR, W), lambda i, s: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BR, W), lambda i, s: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2 * BR * AW,), jnp.uint8),
                        pltpu.SemaphoreType.DMA((2, BR))],
    )
    return pl.pallas_call(
        _v4_kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, W), jnp.int32),
                   jax.ShapeDtypeStruct((B, W), jnp.int32)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))


def main():
    inner = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dev = jax.devices()[0]
    print(f"device={dev.platform}", file=sys.stderr)
    rng = np.random.default_rng(7)
    n = 1_000_000
    seq = rng.integers(0, 4, n + AW + 8192).astype(np.uint8)
    seq2 = rng.integers(0, 4, n + AW + 8192).astype(np.uint8)
    starts = rng.integers(0, n, B).astype(np.int32)
    starts_q = rng.integers(0, n, B).astype(np.int32)
    d_seq = jax.device_put(seq, dev)
    d_seq2 = jax.device_put(seq2, dev)
    d_st = jax.device_put(starts, dev)
    d_st2 = jax.device_put(np.concatenate([starts, starts_q]), dev)

    v1 = _mk(_v1_kernel, 1)
    v2 = _mk(_v2_kernel, 1)
    v3 = _mk(_v3_kernel, 2)
    v4 = _mk4()

    def loop1(fn, extra=None):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def run(st, a, b, *, reps):
            def body(i, acc):
                if extra == "fused":
                    r, q = fn(st + i, a, b)
                    return acc + jnp.sum(r, dtype=jnp.int32) + \
                        jnp.sum(q, dtype=jnp.int32)
                r = fn(st + i, a)
                return acc + jnp.sum(r, dtype=jnp.int32)
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return run

    def prod(st, a, *, i):
        return gather_rows_pallas(a, st, W=W)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def v0_loop(st, a, b, *, reps):
        def body(i, acc):
            r = gather_rows_pallas(a, st + i, W=W)
            return acc + jnp.sum(r, dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    cases = [("v0_prod", v0_loop, None),
             ("v1_dma", loop1(v1), None),
             ("v2_rot", loop1(v2), None),
             ("v3_dbuf", loop1(v3), None),
             ("v4_fused", loop1(v4, "fused"), "fused")]

    for name, fn, kind in cases:
        try:
            t0 = time.time()
            jax.device_get(fn(d_st2 if kind else d_st, d_seq, d_seq2,
                              reps=1))
            compile_s = time.time() - t0
            jax.device_get(fn(d_st2 if kind else d_st, d_seq, d_seq2,
                              reps=inner))
            ts1, tsN = [], []
            for _ in range(3):
                t0 = time.time()
                jax.device_get(fn(d_st2 if kind else d_st, d_seq, d_seq2,
                                  reps=1))
                ts1.append(time.time() - t0)
                t0 = time.time()
                jax.device_get(fn(d_st2 if kind else d_st, d_seq, d_seq2,
                                  reps=inner))
                tsN.append(time.time() - t0)
            per = (np.median(tsN) - np.median(ts1)) / (inner - 1)
            rows = 2 * B if kind else B
            print(f"{name:9s} compile={compile_s:5.1f}s "
                  f"per_call={per*1000:8.2f}ms "
                  f"ns_per_row={per/rows*1e9:7.1f}", flush=True)
        except Exception as e:
            print(f"{name:9s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
