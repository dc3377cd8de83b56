"""Prototype: tile-shared window extraction for the extension first window.

The round-2 profile pins ~50% of extension time on per-row DMA gathers
(~85 ns/row at AW=2048). Hits sorted by ref position are ~32 B apart on
the bench workload, so a group of BR consecutive sorted hits spans a few
KB: ONE tile DMA per group (double-buffered) can replace BR row DMAs,
with per-hit windows extracted from the VMEM tile by cheap 2-vreg
sublane/lane rotates into a "tall" (BR*G, 128) layout (no relayout).

This measures extraction cost per hit on the attached device and checks
bit-exactness of the extraction against numpy.

Usage: python scripts/proto_tiled_gather.py [inner_reps] [outer_reps]
Env:   PT_B=131072 PT_W=512 PT_TILE_ROWS=256 PT_BR=256
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


MODE = os.environ.get("PT_MODE", "loop")


def make_kernel(BR, G2, TILE_ROWS, R):
    def kernel(gbase_ref, starts_ref, seq_ref, out_ref, tile, sems, tall):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)

        def dma(slot, gi):
            base = pl.multiple_of(gbase_ref[gi], 8)
            return pltpu.make_async_copy(
                seq_ref.at[pl.ds(base, TILE_ROWS), :],
                tile.at[slot], sems.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < nprog)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()

        base = gbase_ref[i]

        if MODE == "loop2":
            def ext(j, _):
                s = starts_ref[i * BR + j]
                f = s - base * 128
                fr = f // 128
                a8 = pl.multiple_of((fr // 8) * 8, 8)
                dr = fr - a8
                dc = f - fr * 128
                sup = tile[i % 2, pl.ds(a8, R), :].astype(jnp.int32)
                A = pltpu.roll(sup, R - dr, 0)
                B2 = pltpu.roll(A, R - 1, 0)     # static: A shifted one row
                lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
                C = jnp.where(lane < dc, B2, A)
                o = pltpu.roll(C, 128 - dc, 1)
                tall[pl.ds(j * G2, G2), :] = o[:G2, :]
                return 0

            jax.lax.fori_loop(0, BR, ext, 0)
        else:
            def ext(j, _):
                s = starts_ref[i * BR + j]
                f = s - base * 128
                fr = f // 128
                a8 = pl.multiple_of((fr // 8) * 8, 8)
                dr = fr - a8
                dc = f - fr * 128
                sup = tile[i % 2, pl.ds(a8, R), :].astype(jnp.int32)
                A = pltpu.roll(sup, R - dr, 0)
                B2 = pltpu.roll(sup, R - dr - 1, 0)
                LA = pltpu.roll(A, 128 - dc, 1)
                LB = pltpu.roll(B2, 128 - dc, 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
                o = jnp.where(lane < 128 - dc, LA, LB)
                tall[pl.ds(j * G2, G2), :] = o[:G2, :]
                return 0

            jax.lax.fori_loop(0, BR, ext, 0)
        out_ref[:] = jnp.sum(tall[:].reshape(BR, G2, 128), axis=1)

    return kernel


def make_vec_kernel(BR, G2, TILE_ROWS):
    """Extraction vectorized ACROSS hits: 2 sublane gathers + select +
    1 per-row lane gather; no per-hit scalar loop."""
    def kernel(gbase_ref, sv_ref, seq_ref, out_ref, tile, sems, tall):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)

        def dma(slot, gi):
            base = pl.multiple_of(gbase_ref[gi], 8)
            return pltpu.make_async_copy(
                seq_ref.at[pl.ds(base, TILE_ROWS), :],
                tile.at[slot], sems.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < nprog)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()

        base = gbase_ref[i]
        T = TILE_ROWS
        f = sv_ref[:] - base * 128                      # (BR, 1)
        fr = f // 128
        dc = f - fr * 128
        g3 = jax.lax.broadcasted_iota(jnp.int32, (BR, G2, 128), 1)
        fr3 = jnp.broadcast_to(fr.reshape(BR, 1, 1), (BR, G2, 128))
        ridx = (fr3 + g3).reshape(BR * G2, 128)         # (BR*G2, 128)
        # one-hot row-select matmuls on the MXU: rowsA[i] = tl[ridx[i]],
        # rowsB[i] = tl[ridx[i] + 1] via a statically row-rolled tile
        # (same SEL matrix). Codes are 0..7 so bf16 is exact.
        tcol = jax.lax.broadcasted_iota(jnp.int32, (BR * G2, T), 1)
        sel = (tcol == ridx[:, :1]).astype(jnp.bfloat16)
        tl32 = tile[i % 2].astype(jnp.int32)            # (T, 128)
        tl8 = tl32.astype(jnp.bfloat16)
        tl8u = pltpu.roll(tl32, T - 1, 0).astype(jnp.bfloat16)  # tl[r+1]
        rowsA = jnp.dot(sel, tl8,
                        preferred_element_type=jnp.float32).astype(jnp.int32)
        rowsB = jnp.dot(sel, tl8u,
                        preferred_element_type=jnp.float32).astype(jnp.int32)
        dcv = jnp.broadcast_to(dc.reshape(BR, 1, 1),
                               (BR, G2, 128)).reshape(BR * G2, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BR * G2, 128), 1)
        C = jnp.where(lane < dcv, rowsB, rowsA)
        idx = lane + dcv - jnp.where(lane + dcv >= 128, 128, 0)
        tall[:] = jnp.take_along_axis(C, idx, axis=1)
        out_ref[:] = jnp.sum(tall[:].reshape(BR, G2, 128), axis=1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("BR", "G2", "TILE_ROWS", "interpret"))
def tiled_gather_sum(seq2d, gbase, starts, *, BR, G2, TILE_ROWS,
                     interpret=False):
    B = starts.shape[0]
    R = G2 + 8
    ngroups = B // BR
    if MODE == "vec":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ngroups,),
            in_specs=[pl.BlockSpec((BR, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BR, 128), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, TILE_ROWS, 128), jnp.uint8),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.VMEM((BR * G2, 128), jnp.int32)],
        )
        return pl.pallas_call(
            make_vec_kernel(BR, G2, TILE_ROWS),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(gbase, starts.reshape(B, 1), seq2d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ngroups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BR, 128), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, TILE_ROWS, 128), jnp.uint8),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.VMEM((BR * G2, 128), jnp.int32)],
    )
    return pl.pallas_call(
        make_kernel(BR, G2, TILE_ROWS, R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(gbase, starts, seq2d)


def plan_groups(starts_sorted, BR, tile_bytes, win_bytes):
    """Greedy grouping of sorted starts: each group holds <= BR starts and
    spans <= tile_bytes - win_bytes - 1024. Returns (gbase_rows, padded
    starts, valid) with every group padded to BR rows."""
    cap = tile_bytes - win_bytes - 2048
    groups = []
    cur = [starts_sorted[0]]
    for s in starts_sorted[1:]:
        if len(cur) >= BR or s - cur[0] > cap:
            groups.append(cur)
            cur = [s]
        else:
            cur.append(s)
    groups.append(cur)
    gbase = []
    padded = []
    valid = []
    for g in groups:
        base_row = (g[0] // 1024) * 8  # 1024-byte aligned, in 128B rows
        gbase.append(base_row)
        pad = [g[0]] * (BR - len(g))
        padded.extend(list(g) + pad)
        valid.extend([1] * len(g) + [0] * (BR - len(g)))
    return (np.asarray(gbase, np.int32), np.asarray(padded, np.int32),
            np.asarray(valid, bool))


def main():
    inner = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outer = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    B = int(os.environ.get("PT_B", 131072))
    W = int(os.environ.get("PT_W", 512))
    TILE_ROWS = int(os.environ.get("PT_TILE_ROWS", 256))
    BR = int(os.environ.get("PT_BR", 256))
    G2 = 2 * W // 128
    dev = jax.devices()[0]
    interpret = dev.platform != "tpu"
    print(f"device={dev.platform} B={B} W={W} G2={G2} "
          f"TILE_ROWS={TILE_ROWS} BR={BR} interpret={interpret}",
          file=sys.stderr)

    rng = np.random.default_rng(7)
    n = 4_000_000
    seq = rng.integers(0, 4, n).astype(np.uint8)
    npad = ((n + 2 * W + 4096 + TILE_ROWS * 128) // (TILE_ROWS * 128) + 1) \
        * TILE_ROWS * 128
    seq_pad = np.zeros(npad, np.uint8)
    seq_pad[:n] = seq
    seq2d = seq_pad.reshape(-1, 128)

    starts = np.sort(rng.integers(2 * W, n, B).astype(np.int32)) - W
    gbase, padded, valid = plan_groups(starts, BR, TILE_ROWS * 128, 2 * W)
    ngroups = len(gbase)
    print(f"groups={ngroups} pad_factor={len(padded)/B:.3f}",
          file=sys.stderr)

    d_seq = jax.device_put(seq2d, dev)
    d_gbase = jax.device_put(gbase, dev)
    d_starts = jax.device_put(padded, dev)

    if interpret or os.environ.get("PT_CHECK"):
        # correctness: row j's extracted window == seq_pad[s : s + G2*128]
        nb = min(len(padded), 2 * BR)
        out = np.asarray(tiled_gather_sum(
            d_seq, d_gbase[:nb // BR], d_starts[:nb], BR=BR, G2=G2,
            TILE_ROWS=TILE_ROWS, interpret=interpret))
        want = np.stack([
            seq_pad[s:s + G2 * 128].reshape(G2, 128).astype(np.int64)
            .sum(0) for s in padded[:nb]])
        assert (out.astype(np.int64) == want).all(), "extraction mismatch"
        print("extraction matches numpy", file=sys.stderr)
        if interpret:
            return

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(seq2d, gbase, starts, *, reps):
        def body(i, acc):
            r = tiled_gather_sum(seq2d, gbase, starts + (i % 7), BR=BR,
                                 G2=G2, TILE_ROWS=TILE_ROWS)
            return acc + jnp.sum(r, dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    nb_all = len(padded)
    r = loop(d_seq, d_gbase, d_starts, reps=1)
    jax.block_until_ready(r)
    for _ in range(outer):
        t0 = time.time()
        r = loop(d_seq, d_gbase, d_starts, reps=inner)
        jax.block_until_ready(r)
        dt = time.time() - t0
        per_row = dt / inner / nb_all * 1e9
        print(f"tiled_gather: {dt/inner*1000:.2f} ms/iter "
              f"({per_row:.1f} ns/row, {nb_all} rows)", file=sys.stderr)


if __name__ == "__main__":
    main()
