"""Benchmark: ungapped seed-filter-extend throughput on one chip.

Generates a synthetic genome pair with realistic homology structure, runs
the full per-chunk pipeline (device seeding -> hit expansion -> x-drop
extension -> candidate compaction -> host finalize/dedup), and reports
query throughput.

Prints ONE json line:
  {"metric": "ungapped_query_mbps", "value": ..., "unit": "Mbp/s",
   "vs_baseline": ...}

vs_baseline normalizes against NOMINAL_V100_MBPS, an ESTIMATE of
SegAlign's per-V100 ungapped throughput on comparable data. The reference
repo publishes no numbers (BASELINE.md); the estimate derives from the SC20
paper's reported end-to-end speedups over lastz on AWS P3. Treat it as a
fixed yardstick across rounds, not ground truth.
"""

import json
import os
import sys
import time

import numpy as np

NOMINAL_V100_MBPS = 2.0

REF_MBP = float(os.environ.get("BENCH_REF_MBP", 4.0))
QUERY_MBP = float(os.environ.get("BENCH_QUERY_MBP", 4.0))
CHUNK = 250_000


def synth_genome(rng, n, homolog_from=None, identity=0.85, repeat_frac=0.10):
    seq = rng.integers(0, 4, n).astype(np.uint8)
    if homolog_from is not None:
        # plant diverged copies of segments of the partner genome
        total = int(n * repeat_frac)
        placed = 0
        while placed < total:
            ln = int(rng.integers(2_000, 30_000))
            src = int(rng.integers(0, len(homolog_from) - ln))
            dst = int(rng.integers(0, n - ln))
            core = homolog_from[src:src + ln]
            mut = rng.random(ln) >= identity
            seq[dst:dst + ln] = np.where(
                mut, (core + rng.integers(1, 4, ln)) % 4, core)
            placed += ln
    # soft-masked and N stretches like real assemblies
    for _ in range(n // 500_000):
        p = int(rng.integers(0, n - 1000))
        seq[p:p + int(rng.integers(100, 1000))] = 4
    for _ in range(n // 1_000_000):
        p = int(rng.integers(0, n - 500))
        seq[p:p + int(rng.integers(50, 500))] = 5
    return seq


def load_inputs():
    """Synthetic pair by default; real FASTA via BENCH_REF_FASTA /
    BENCH_QUERY_FASTA env paths (BASELINE.md configs run the moment
    genomes are mounted). Real inputs report the measured hit density so
    the synthetic generator's 6.2 M hits/Mbp choice can be validated."""
    ref_fa = os.environ.get("BENCH_REF_FASTA")
    query_fa = os.environ.get("BENCH_QUERY_FASTA")
    if ref_fa and query_fa:
        from segalign_tpu.io.fasta import read_fasta
        from segalign_tpu.io.encode import encode
        ref = np.concatenate([encode(s) for _, s in read_fasta(ref_fa)])
        query = np.concatenate([encode(s)
                                for _, s in read_fasta(query_fa)])
        print(f"bench inputs: {ref_fa} ({len(ref)/1e6:.1f} Mbp) x "
              f"{query_fa} ({len(query)/1e6:.1f} Mbp)", file=sys.stderr)
        return ref, query
    rng = np.random.default_rng(2024)
    ref = synth_genome(rng, int(REF_MBP * 1e6))
    query = synth_genome(rng, int(QUERY_MBP * 1e6), homolog_from=ref)
    return ref, query


def bench_gapped(ref, q_fw, q_rc, hsp_batches, sub8x8):
    """Native ydrop gapped stage over the ungapped stage's real output:
    one DP extension per final HSP, anchored at its midpoint — the same
    per-segment contract the reference delegates to <= nproc lastz
    processes (scripts/run_segalign:112-117). Returns (seconds,
    n_extensions, n_accepted)."""
    from concurrent.futures import ThreadPoolExecutor
    from segalign_tpu.native import gapped_extend_native
    jobs = []
    for hsps, rev in hsp_batches:
        q = q_rc if rev else q_fw
        for rs, qs, ln, sc in hsps:
            jobs.append((q, int(rs + ln // 2), int(qs + ln // 2)))
    t0 = time.time()

    def one(j):
        q, mid_r, mid_q = j
        r = gapped_extend_native(ref, q, sub8x8, 400, 30, 9430,
                                 mid_r, mid_q)
        return r is not None and r[0] >= 3000

    # ctypes releases the GIL during the DP; <= nproc workers like the
    # reference's lastz process pool
    with ThreadPoolExecutor(max_workers=os.cpu_count() or 1) as ex:
        nacc = sum(ex.map(one, jobs))
    return time.time() - t0, len(jobs), nacc


def main():
    ref, query = load_inputs()
    n_ref, n_query = len(ref), len(query)
    from segalign_tpu.io.encode import revcomp_codes
    qrc = revcomp_codes(query)

    from segalign_tpu.config import make_seed_config, build_substitution_matrix
    from segalign_tpu.pipeline.device import DeviceAligner

    sc = make_seed_config("12of19")
    sub = build_substitution_matrix(910)
    al = DeviceAligner(
        shape_pos=sc.shape_pos, seed_size=sc.size, transition=True, step=1,
        sub_mat=sub, xdrop=910, hspthresh=3000, noentropy=False,
        chunk_size=CHUNK)

    t0 = time.time()
    al.set_ref(ref)
    table_s = time.time() - t0
    al.set_query(query, qrc)

    q_len = n_query - sc.size
    # warmup: compile on first chunks
    al.seed_and_filter(0, CHUNK, rev=False)
    al.seed_and_filter(0, CHUNK, rev=True)

    from segalign_tpu.parallel.multi import ChunkWork
    work = []
    for cs in range(0, q_len, CHUNK):
        ce = min(cs + CHUNK, q_len)
        work.append(ChunkWork(cs, ce, False))
        work.append(ChunkWork(cs, ce, True))

    t1 = time.time()
    stats = dict(hsps=0, hits=0, seeds=0)
    # pipelined production path: dispatch-ahead chunk processing
    results = al.map_chunks(work, depth=6)
    for r in results:
        stats["hsps"] += len(r.hsps)
        stats["hits"] += r.num_hits
        stats["seeds"] += r.num_seeds
    dt = time.time() - t1

    mbps = (n_query / 1e6) / dt
    print(f"bench: {n_query/1e6:.0f} Mbp query vs {n_ref/1e6:.0f} Mbp ref "
          f"in {dt:.2f}s (+{table_s:.2f}s table) | "
          f"seeds={stats['seeds']} hits={stats['hits']} "
          f"hsps={stats['hsps']} "
          f"({stats['hits']/(n_query/1e6):.2g} hits/Mbp)", file=sys.stderr)

    if os.environ.get("SEGALIGN_BENCH_GAPPED", "1") != "0":
        hsp_batches = [(r.hsps, w.rev) for r, w in zip(results, work)
                       if len(r.hsps)]
        g_s, g_n, g_acc = bench_gapped(ref, query, qrc, hsp_batches, sub)
        e2e = (n_query / 1e6) / (dt + g_s)
        print(f"gapped stage (native ydrop): {g_n} segments in {g_s:.2f}s "
              f"({g_n/max(g_s,1e-9):.0f} segments/s, {g_acc} accepted) | "
              f"end-to-end {e2e:.3f} Mbp/s", file=sys.stderr)

    print(json.dumps({
        "metric": "ungapped_query_mbps",
        "value": round(mbps, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(mbps / NOMINAL_V100_MBPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
