"""Ablation probe for the round-3 fused-program anomaly.

The tiled first-window kernel measures 116 ns/hit standalone, yet the
fused extend+compact program (ops/extend_fused.extend_compact_tiled)
measures ~2x the sum of its separately-measured parts. This probe
bisects the fused program by CONTENT and by SIZE on a bench-realistic
planned workload, with the fori-repetition methodology (the only timing
that survives the axon tunnel's noise): each variant runs `reps` times
inside ONE jitted lax.fori_loop whose body depends on the previous
iteration's output (a provably-zero perturbation XLA cannot hoist), and
the cost is (t(hi) - t(lo)) / (hi - lo).

Usage: python scripts/probe_fused_anomaly.py [variant ...]
Env:   PROBE_ROWS=262144 PROBE_LO=2 PROBE_HI=6 PROBE_CONT=4096 ...
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("SEGALIGN_TILED", "1")

import jax
import jax.numpy as jnp

ROWS = int(os.environ.get("PROBE_ROWS", str(1 << 18)))
LO = int(os.environ.get("PROBE_LO", "2"))
HI = int(os.environ.get("PROBE_HI", "6"))


def build_workload():
    """Bench-identical data -> native seeder -> plan_tiled_groups."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    rng = np.random.default_rng(2024)
    ref = bench.synth_genome(rng, 4_000_000)
    query = bench.synth_genome(rng, 4_000_000, homolog_from=ref)
    from segalign_tpu.io.encode import revcomp_codes
    qrc = revcomp_codes(query)
    from segalign_tpu.config import make_seed_config, \
        build_substitution_matrix
    from segalign_tpu.pipeline.device import DeviceAligner
    sc = make_seed_config("12of19")
    sub = build_substitution_matrix(910)
    al = DeviceAligner(
        shape_pos=sc.shape_pos, seed_size=sc.size, transition=True, step=1,
        sub_mat=sub, xdrop=910, hspthresh=3000, noentropy=False,
        chunk_size=250_000)
    al.set_ref(ref)
    al.set_query(query, qrc)
    index_table, pos_table = al._host_tables
    ref_loc, query_loc, _, _, ns, nh = al._native_seeder.seed(
        al._q_fw_host, 0, 250_000, index_table, pos_table,
        al.shape_pos, al.seed_size, al.max_hits)
    print(f"workload: {ns} seeds {nh} hits (chunk 0 fw); using first "
          f"{ROWS} hits", file=sys.stderr)
    assert len(ref_loc) >= ROWS, len(ref_loc)
    ref_loc = ref_loc[:ROWS]
    query_loc = query_loc[:ROWS]
    from segalign_tpu.ops.extend_tiled import plan_tiled_groups
    plan = plan_tiled_groups(ref_loc, query_loc, W=al.W_TILED, pad=al.pad,
                             BR=al.BR_TILED, trows=al.TROWS,
                             qbucket=al.QBUCKET, trows_q=al.TQROWS)
    ng = plan["ngroups"]
    print(f"plan: {ng} groups x {al.BR_TILED} rows = {ng*al.BR_TILED} "
          f"(valid {int(plan['valid'].sum())})", file=sys.stderr)
    return al, plan


def measure(label, fn, *args):
    """fn(reps, *args) -> device scalar; steady-state per-rep seconds."""
    # compile + warm
    t0 = time.time()
    jax.device_get(fn(LO, *args))
    tc = time.time() - t0
    times = {}
    for reps in (LO, HI, LO, HI):   # interleave to expose drift
        t0 = time.time()
        jax.device_get(fn(reps, *args))
        dt = time.time() - t0
        times.setdefault(reps, []).append(dt)
    tlo = min(times[LO])
    thi = min(times[HI])
    per = (thi - tlo) / (HI - LO)
    print(f"{label:28s} per-rep {per*1000:8.2f} ms  "
          f"(lo {tlo*1000:.1f} hi {thi*1000:.1f} compile {tc:.1f}s)",
          flush=True)
    return per


def main():
    only = set(sys.argv[1:])
    al, plan = build_workload()
    from segalign_tpu.ops.extend_fused import (
        extend_compact_tiled, extend_fields_tiled, _run_tail,
        _run_tails_joint)
    from segalign_tpu.ops.extend_tiled import first_scan_tiled

    dev = al.device
    BR, TR, W, pad = al.BR_TILED, al.TROWS, al.W_TILED, al.pad
    TQ = al.TQROWS
    CONT = int(os.environ.get("PROBE_CONT", "0")) or al.CONT
    W_CONT = int(os.environ.get("PROBE_WCONT", "0")) or al.W_CONT
    UNROLL = int(os.environ.get("PROBE_UNROLL", "0")) or al.UNROLL
    kw = dict(pad=pad, W=W, CONT=CONT, engine="pallas", W_CONT=W_CONT,
              UNROLL=UNROLL, BR=BR, TR=TR, TQ=TQ)

    def mk_inputs(nrows):
        ng = nrows // BR
        rows4 = np.zeros((4, nrows), np.int32)
        rows4[0] = plan["rl"][:nrows]
        rows4[1] = plan["ql"][:nrows]
        rows4[2] = plan["valid"][:nrows]
        rows4[3] = plan["orig"][:nrows]
        bases = np.zeros((2, ng), np.int32)
        bases[0] = plan["rbase"][:ng]
        bases[1] = plan["qbase"][:ng]
        return (jax.device_put(bases, dev), jax.device_put(rows4, dev))

    d_bases, d_rows4 = mk_inputs(ROWS)
    sub = al.sub_flat
    consts = (jnp.int32(910), jnp.int32(3000), jnp.int32(al.ref_len),
              jnp.int32(al.q_len))

    def dep0(acc):
        """Provably-zero int32 that XLA cannot fold away."""
        return jnp.where(acc == jnp.int32(-2147483647), jnp.int32(1),
                         jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("reps",))
    def full(reps, bases, rows4):
        def body(i, acc):
            total, packed = extend_compact_tiled.__wrapped__(
                al.ref_2d, al.q2d_fw, bases,
                rows4.at[0, 0].add(dep0(acc) * 0 + 0 * dep0(acc)),
                sub, consts[0] + dep0(acc), consts[1], consts[2],
                consts[3], CBUF=al.CBUF, **kw)
            return acc + total + packed[0, 1]
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("reps",))
    def nocompact(reps, bases, rows4):
        def body(i, acc):
            fin = extend_fields_tiled.__wrapped__(
                al.ref_2d, al.q2d_fw, bases[0], bases[1], rows4[0],
                rows4[1], rows4[2] != 0, rows4[3], sub,
                consts[0] + dep0(acc), consts[1], consts[2], consts[3],
                **kw)
            return acc + jnp.sum(fin["length"], dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("reps",))
    def first_only(reps, bases, rows4):
        def body(i, acc):
            st_r, st_l = first_scan_tiled.__wrapped__(
                al.ref_2d, al.q2d_fw, bases[0], bases[1], rows4[0],
                rows4[1], rows4[2] != 0, sub, consts[0] + dep0(acc),
                consts[2], consts[3], W=W, pad=pad, BR=BR, TR=TR, TQ=TQ,
                interpret=False)
            return acc + jnp.sum(st_r["maxv"], dtype=jnp.int32) \
                + jnp.sum(st_l["maxv"], dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    # precomputed first-scan state for tail-only variants
    st_r0, st_l0 = first_scan_tiled(
        al.ref_2d, al.q2d_fw, d_bases[0], d_bases[1], d_rows4[0],
        d_rows4[1], d_rows4[2] != 0, sub, consts[0], consts[2], consts[3],
        W=W, pad=pad, BR=BR, TR=TR, TQ=TQ)
    na_r0 = int(jnp.sum(~st_r0["done"]))
    na_l0 = int(jnp.sum(~st_l0["done"]))
    print(f"first-window survivors: right {na_r0} left {na_l0} "
          f"of {ROWS}", file=sys.stderr)
    seq_r = al.ref_2d.reshape(-1)
    seq_q = al.q2d_fw.reshape(-1)
    tail_kw = dict(pad=pad, W=W, CONT=CONT, engine="pallas",
                   W_CONT=W_CONT, UNROLL=UNROLL)

    def mk_tail(left, st0):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def tail(reps, rows4, st0=st0, left=left):
            def body(i, acc):
                st = dict(st0)
                st["cum"] = st["cum"] + dep0(acc)
                na = jnp.sum(~st["done"], dtype=jnp.int32)
                out = _run_tail(seq_r, seq_q, rows4[0], rows4[1], st, na,
                                sub, consts[0], consts[2], consts[3],
                                left=left, **tail_kw)
                return acc + jnp.sum(out["maxv"], dtype=jnp.int32)
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return tail

    @functools.partial(jax.jit, static_argnames=("reps",))
    def tail_joint(reps, rows4):
        def body(i, acc):
            sr = dict(st_r0)
            sl = dict(st_l0)
            sr["cum"] = sr["cum"] + dep0(acc)
            nr = jnp.sum(~sr["done"], dtype=jnp.int32)
            nl = jnp.sum(~sl["done"], dtype=jnp.int32)
            out_r, out_l = _run_tails_joint(
                seq_r, seq_q, rows4[0], rows4[1], sr, nr, sl, nl, sub,
                consts[0], consts[2], consts[3], **tail_kw)
            return acc + jnp.sum(out_r["maxv"], dtype=jnp.int32) \
                + jnp.sum(out_l["maxv"], dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    variants = {
        "full": lambda: measure(f"full fused {ROWS}", full, d_bases,
                                d_rows4),
        "tail_joint": lambda: measure(f"tail joint {ROWS}", tail_joint,
                                      d_rows4),
        "nocompact": lambda: measure(f"no-compact {ROWS}", nocompact,
                                     d_bases, d_rows4),
        "first": lambda: measure(f"first-scan only {ROWS}", first_only,
                                 d_bases, d_rows4),
        "tail_r": lambda: measure(f"tail right {ROWS}",
                                  mk_tail(False, st_r0), d_rows4),
        "tail_l": lambda: measure(f"tail left {ROWS}",
                                  mk_tail(True, st_l0), d_rows4),
    }
    if "sizes" in only:
        only.discard("sizes")
        for p in (14, 15, 16, 17, 18):
            nr = 1 << p
            if nr > ROWS:
                break
            b, r = mk_inputs(nr)
            measure(f"full fused {nr}", full, b, r)
        return
    for name, fn in variants.items():
        if only and name not in only:
            continue
        fn()


if __name__ == "__main__":
    main()
