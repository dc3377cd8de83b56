"""Randomized parity fuzz: DeviceAligner vs the NumPy oracle.

Sweeps random genome structure (repeat copies, tandem arrays, soft-mask
runs, N runs, walls), random scoring/seeding parameters (xdrop,
hspthresh, max_hits, chunk size, noentropy, seed shape), and mode
(pairwise / RM window, fw / rc strand), asserting bit-exact HSP parity
per chunk-strand. The committed test suite pins a few seeds; this
harness is the wide net (CI-speed subset: tests/test_device_vs_oracle
.py::test_fuzz_parity_subset).

Usage: python scripts/fuzz_oracle.py [n_cases] [start_seed]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SEGALIGN_DEVICES", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RC = np.array([3, 2, 1, 0, 4, 5, 6, 7], np.uint8)


def random_genome(rng, n):
    seq = rng.integers(0, 4, n).astype(np.uint8)
    for _ in range(int(rng.integers(0, 4))):       # soft-masked runs
        p = int(rng.integers(0, n - 50))
        seq[p:p + int(rng.integers(5, 50))] = 4
    for _ in range(int(rng.integers(0, 3))):       # N runs
        p = int(rng.integers(0, n - 30))
        seq[p:p + int(rng.integers(3, 30))] = 5
    if rng.random() < 0.3:                          # '&' wall
        seq[int(rng.integers(0, n))] = 6
    return seq


def random_pair(rng, n_ref, n_query):
    ref = random_genome(rng, n_ref)
    query = random_genome(rng, n_query)
    # planted repeats: exact + diverged copies, some rc
    core_len = int(rng.integers(60, 500))
    core = rng.integers(0, 4, core_len).astype(np.uint8)
    for _ in range(int(rng.integers(1, 6))):
        p = int(rng.integers(0, n_ref - core_len))
        mut = rng.random(core_len) < rng.uniform(0, 0.1)
        ref[p:p + core_len] = np.where(
            mut, (core + 1) % 4, core)
    for _ in range(int(rng.integers(1, 4))):
        p = int(rng.integers(0, n_query - core_len))
        c = core if rng.random() < 0.7 else RC[core[::-1]]
        query[p:p + core_len] = c
    if rng.random() < 0.5:                          # tandem array
        u = rng.integers(0, 4, int(rng.integers(2, 7))).astype(np.uint8)
        arr = np.tile(u, 200)[:int(rng.integers(100, 600))]
        p = int(rng.integers(0, n_ref - len(arr)))
        ref[p:p + len(arr)] = arr
        p = int(rng.integers(0, n_query - len(arr)))
        query[p:p + len(arr)] = arr
    return ref, query


def run_case(seed: int) -> str:
    from segalign_tpu.config import make_seed_config, \
        build_substitution_matrix
    from segalign_tpu.io.blocks import chunk_interval
    from segalign_tpu.oracle import reference as oracle
    from segalign_tpu.pipeline.device import DeviceAligner

    rng = np.random.default_rng(seed)
    n_ref = int(rng.integers(800, 4000))
    n_query = int(rng.integers(800, 4000))
    ref, query = random_pair(rng, n_ref, n_query)
    shape = ["12of19", "14of22"][int(rng.integers(0, 2))]
    sc = make_seed_config(shape)
    xdrop = int(rng.choice([300, 910, 1500]))
    hspthresh = int(rng.choice([800, 1500, 3000]))
    noentropy = bool(rng.random() < 0.3)
    max_hits = int(rng.choice([10**9, 64, 256]))
    chunk = int(rng.choice([256, 512, 1024]))
    rm = bool(rng.random() < 0.3)
    window = None
    if rm:
        lo = int(rng.integers(0, n_ref // 2))
        window = (lo, int(rng.integers(lo, n_ref)))
    sub = build_substitution_matrix(xdrop)

    it, pt = oracle.generate_seed_pos_table(
        ref, 1, sc.shape_pos, sc.size, sc.kmer_size)
    al = DeviceAligner(
        shape_pos=sc.shape_pos, seed_size=sc.size,
        transition=sc.transition, step=1, sub_mat=sub, xdrop=xdrop,
        hspthresh=hspthresh, noentropy=noentropy, chunk_size=chunk,
        max_hits=max_hits, HBUF=1024, B=256, W=128, rm_mode=rm)
    al.set_ref(ref)
    qrc = RC[query[::-1]]
    al.set_query(query, qrc)

    q_len = len(query) - sc.size
    n_hsps = 0
    for (cs, ce) in chunk_interval(0, q_len, chunk):
        for rev in (False, True):
            qarr = qrc if rev else query
            seeds = oracle.extract_seed_offsets(
                qarr, 0, cs, ce, sc.size, sc.shape_pos, sc.transition)
            if seeds:
                hsps, want_nh = oracle.seed_and_filter(
                    seeds, it.astype(np.int64), pt, ref, qarr, sc.size,
                    sub, xdrop, hspthresh, noentropy, max_hits,
                    window=window, rm_mode=rm, rev=rev)
                want = np.array([h.astuple() for h in hsps],
                                np.int64).reshape(-1, 4)
            else:
                want, want_nh = np.zeros((0, 4), np.int64), 0
            got = al.seed_and_filter(cs, ce, rev, window=window)
            assert got.num_hits == want_nh, \
                f"seed={seed} {cs}:{ce} rev={rev} nh {got.num_hits} " \
                f"!= {want_nh}"
            np.testing.assert_array_equal(
                got.hsps, want,
                err_msg=f"seed={seed} {cs}:{ce} rev={rev}")
            n_hsps += len(want)
    return (f"seed={seed} shape={shape} xdrop={xdrop} thr={hspthresh} "
            f"mh={max_hits} chunk={chunk} rm={rm} noent={noentropy} "
            f"hsps={n_hsps} OK")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    s0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    for seed in range(s0, s0 + n):
        print(run_case(seed), flush=True)


if __name__ == "__main__":
    main()
