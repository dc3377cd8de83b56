"""Microbenchmark of extend_compact_program on the attached device.

Separates per-program fixed overhead from per-hit compute by sweeping
batch size B and first-window width W on a realistic hit mix (random
background + planted homologous hits). Steady-state timing, post-warmup.

Usage: python scripts/microbench_extend.py [reps]
Env:   MB_WS="512,256,128"  MB_BS="32768,131072"  MB_ENGINE=pallas|xla
"""

import os
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ws = [int(x) for x in os.environ.get("MB_WS", "512,256,128").split(",")]
    bs = [int(x) for x in
          os.environ.get("MB_BS", "32768,131072").split(",")]

    import jax
    from segalign_tpu.config import build_substitution_matrix
    from segalign_tpu.ops.extend import pad_sequence
    from segalign_tpu.ops.extend_fused import extend_compact_program
    from segalign_tpu.ops.extend_pallas import awin_for

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    engine = os.environ.get("MB_ENGINE") or ("pallas" if on_tpu else "xla")
    print(f"device={dev.platform} engine={engine}", file=sys.stderr)

    rng = np.random.default_rng(7)
    n = 1_000_000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    # plant homology so ~3% of hits extend long (bench-like mix)
    core = rng.integers(0, 4, 30_000).astype(np.uint8)
    mut = rng.random(30_000) >= 0.85
    ref[100_000:130_000] = core
    query[200_000:230_000] = np.where(mut, (core + 1) % 4, core)

    sub_flat = np.ascontiguousarray(
        build_substitution_matrix(910).reshape(-1), np.int32)

    W_CONT = 2048
    for W in ws:
        pad = max(W, W_CONT)
        aw = awin_for(max(W, W_CONT))
        ref_pad = jax.device_put(pad_sequence(ref, pad, pad + aw), dev)
        q_pad = jax.device_put(pad_sequence(query, pad, pad + aw), dev)
        for B in bs:
            # 97% random hits, 3% homologous
            nh = int(B * 0.03)
            rl = rng.integers(pad // 2, n - pad // 2, B).astype(np.int32)
            ql = rng.integers(pad // 2, n - pad // 2, B).astype(np.int32)
            off = rng.integers(0, 29_000, nh).astype(np.int32)
            rl[:nh] = 100_000 + off
            ql[:nh] = 200_000 + off
            d_r = jax.device_put(rl, dev)
            d_q = jax.device_put(ql, dev)

            def run():
                return extend_compact_program(
                    ref_pad, q_pad, d_r, d_q, B, sub_flat, 910, 3000,
                    n, n, pad=pad, W=W, CBUF=2048, engine=engine,
                    W_CONT=W_CONT)

            t0 = time.time()
            nn, pk = jax.block_until_ready(run())
            compile_s = time.time() - t0
            # latency: block each program on BOTH outputs
            ts = []
            for _ in range(reps):
                t0 = time.time()
                jax.block_until_ready(run())
                ts.append(time.time() - t0)
            ts = np.array(ts)
            # throughput: enqueue reps programs, block once at the end
            t0 = time.time()
            outs = [run() for _ in range(reps)]
            jax.block_until_ready(outs)
            thr = (time.time() - t0) / reps
            print(f"W={W:4d} B={B:6d} cand={int(nn):5d} "
                  f"compile={compile_s:6.1f}s "
                  f"lat_med={np.median(ts)*1000:8.2f}ms "
                  f"lat_min={ts.min()*1000:8.2f}ms "
                  f"thr={thr*1000:8.2f}ms "
                  f"thr_us_per_hit={thr/B*1e6:6.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
