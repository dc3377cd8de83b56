"""CLI-level sharded-table parity: `run_segalign --sharded_table` must
produce byte-identical segments output to the default replicated path on
the virtual 8-device CPU mesh.

This drives the v2 scale-out mode (parallel/sharded.ShardedAligner)
through the production entry point — the reference seam being transcended
is the per-GPU table replication at
/root/reference/common/seed_pos_table.cu:33-47."""

import os

import numpy as np

from segalign_tpu.cli.run_segalign import main as run_segalign_main
from segalign_tpu.io.fasta import write_fasta

BASES = "ACGT"


def rand_dna(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def _make_genomes(d):
    rng = np.random.default_rng(99)
    core1 = rand_dna(rng, 600)
    core2 = rand_dna(rng, 400)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc_core2 = "".join(comp[c] for c in reversed(core2))
    t_chr1 = rand_dna(rng, 500) + core1 + rand_dna(rng, 400)
    t_chr2 = rand_dna(rng, 200) + core2 + rand_dna(rng, 300)
    q_chr1 = rand_dna(rng, 300) + core1 + rand_dna(rng, 200)
    q_chr2 = rand_dna(rng, 350) + rc_core2 + rand_dna(rng, 250)
    ref_fa = os.path.join(d, "target.fa")
    query_fa = os.path.join(d, "query.fa")
    write_fasta(ref_fa, [("t_chr1", t_chr1), ("t_chr2", t_chr2)])
    write_fasta(query_fa, [("q_chr1", q_chr1), ("q_chr2", q_chr2)])
    return ref_fa, query_fa


def _run(ref_fa, query_fa, out_path, workdir, extra):
    rc = run_segalign_main([
        ref_fa, query_fa, "--nogapped", "--output", out_path,
        "--markend", "--hspthresh", "1500", "--noentropy",
        "--wga_chunk_size", "512", "--lastz_interval_size", "1000",
        "--workdir", workdir] + extra)
    assert rc == 0
    with open(out_path, "rb") as f:
        return f.read()


def test_sharded_cli_byte_identical(tmp_path):
    ref_fa, query_fa = _make_genomes(str(tmp_path))
    a = _run(ref_fa, query_fa, str(tmp_path / "rep.segments"),
             str(tmp_path / "w1"), [])
    b = _run(ref_fa, query_fa, str(tmp_path / "shd.segments"),
             str(tmp_path / "w2"), ["--sharded_table"])
    assert a.count(b"\n") > 2  # real content, not just the markend line
    assert a == b
