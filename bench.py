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


def main():
    rng = np.random.default_rng(2024)
    n_ref = int(REF_MBP * 1e6)
    n_query = int(QUERY_MBP * 1e6)
    ref = synth_genome(rng, n_ref)
    query = synth_genome(rng, n_query, homolog_from=ref)
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
          f"hsps={stats['hsps']}", file=sys.stderr)
    print(json.dumps({
        "metric": "ungapped_query_mbps",
        "value": round(mbps, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(mbps / NOMINAL_V100_MBPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
