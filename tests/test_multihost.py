"""Multi-host partitioning: the union of per-host outputs equals the
single-host output (replicated-table / partitioned-intervals scheme)."""

import os

import numpy as np

from segalign_tpu.config import Config
from segalign_tpu.pipeline.pairwise import run_pairwise
from segalign_tpu.io.fasta import write_fasta

BASES = "ACGT"


def rand_dna(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def seg_files(d):
    return {f: open(os.path.join(d, f)).read() for f in os.listdir(d)
            if f.endswith(".segments")}


def test_two_host_partition_equals_single(tmp_path, monkeypatch):
    rng = np.random.default_rng(23)
    core1 = rand_dna(rng, 300)
    core2 = rand_dna(rng, 250)
    t_chr = rand_dna(rng, 300) + core1 + rand_dna(rng, 900) + core2 + \
        rand_dna(rng, 400)
    q_chr = rand_dna(rng, 150) + core1 + rand_dna(rng, 1100) + core2 + \
        rand_dna(rng, 300)
    ref_fa = str(tmp_path / "t.fa")
    query_fa = str(tmp_path / "q.fa")
    write_fasta(ref_fa, [("t", t_chr)])
    write_fasta(query_fa, [("q", q_chr)])

    def cfg():
        return Config(
            reference_filename=ref_fa, query_filename=query_fa,
            data_folder="", gapped=False, noentropy=True, hspthresh=1500,
            wga_chunk_size=512, lastz_interval_size=700,
            seq_block_size=10**6, device_hbuf=1024, device_batch=256)

    single = str(tmp_path / "single")
    os.makedirs(single)
    run_pairwise(cfg(), single)
    want = seg_files(single)
    assert want

    got = {}
    for host in (0, 1):
        d = str(tmp_path / f"host{host}")
        os.makedirs(d)
        monkeypatch.setenv("SEGALIGN_NUM_HOSTS", "2")
        monkeypatch.setenv("SEGALIGN_HOST_ID", str(host))
        run_pairwise(cfg(), d)
        files = seg_files(d)
        assert not (set(files) & set(got)), "hosts overlapped on intervals"
        got.update(files)
    monkeypatch.delenv("SEGALIGN_NUM_HOSTS")
    monkeypatch.delenv("SEGALIGN_HOST_ID")

    assert got == want
