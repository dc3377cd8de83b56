"""Checkpoint/resume: a resumed run skips completed intervals and produces
identical output."""

import os

import numpy as np

from segalign_tpu.config import Config
from segalign_tpu.pipeline.pairwise import run_pairwise
from segalign_tpu.io.fasta import write_fasta

BASES = "ACGT"


def rand_dna(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def make_cfg(ref_fa, query_fa):
    return Config(
        reference_filename=ref_fa, query_filename=query_fa,
        data_folder="", gapped=False, noentropy=True, hspthresh=1500,
        wga_chunk_size=512, lastz_interval_size=800, seq_block_size=10**6,
        device_hbuf=1024, device_batch=256)


def test_resume_skips_done_intervals(tmp_path):
    rng = np.random.default_rng(17)
    core = rand_dna(rng, 300)
    t_chr = rand_dna(rng, 500) + core + rand_dna(rng, 1500)
    q_chr = rand_dna(rng, 200) + core + rand_dna(rng, 1800)
    ref_fa = str(tmp_path / "t.fa")
    query_fa = str(tmp_path / "q.fa")
    write_fasta(ref_fa, [("t", t_chr)])
    write_fasta(query_fa, [("q", q_chr)])

    out1 = str(tmp_path / "o1")
    os.makedirs(out1)
    s1 = run_pairwise(make_cfg(ref_fa, query_fa), out1)
    files1 = {f: open(os.path.join(out1, f)).read()
              for f in os.listdir(out1) if f.endswith(".segments")}
    assert files1

    # fresh dir, pre-seed manifest with a partial run: run once, delete one
    # segment file, then resume - it must NOT be recreated (interval marked
    # done), and stats must show skipped work
    out2 = str(tmp_path / "o2")
    os.makedirs(out2)
    run_pairwise(make_cfg(ref_fa, query_fa), out2)
    victims = [f for f in os.listdir(out2) if f.endswith(".segments")]
    os.remove(os.path.join(out2, victims[0]))
    s3 = run_pairwise(make_cfg(ref_fa, query_fa), out2, resume=True)
    assert s3.num_seeds == 0  # every interval skipped
    assert not os.path.exists(os.path.join(out2, victims[0]))

    # resume=False reruns everything and recreates the file identically
    s4 = run_pairwise(make_cfg(ref_fa, query_fa), out2, resume=False)
    assert s4.num_seeds == s1.num_seeds
    assert (open(os.path.join(out2, victims[0])).read()
            == files1[victims[0]])
