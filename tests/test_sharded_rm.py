"""CLI-level sharded-table parity for REPEAT-MASKER mode:
`run_segalign_repeat_masker --sharded_table` must produce byte-identical
.seg output to the replicated path on the virtual 8-device CPU mesh.

RM is the mode that needs table sharding FIRST (1 GB blocks vs pairwise
500 MB, /root/reference/repeat_masker_src/graph.h:10), and its in-window
hit restriction (repeat_masker_src/seed_filter.cu:239-244) must compose
with shard-local hit expansion — this test pins both."""

import os

import numpy as np

from segalign_tpu.cli.run_segalign_repeat_masker import main as rm_main
from segalign_tpu.io.fasta import write_fasta

BASES = "ACGT"


def rand_dna(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def _make_genome(d):
    """Self-similar genome: repeated elements across two chromosomes so
    the coverage intervals are non-trivial on both strands."""
    rng = np.random.default_rng(17)
    rep = rand_dna(rng, 250)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc_rep = "".join(comp[c] for c in reversed(rep))
    chr1 = (rand_dna(rng, 300) + rep + rand_dna(rng, 150) + rc_rep +
            rand_dna(rng, 250))
    chr2 = rand_dna(rng, 200) + rep + rand_dna(rng, 300)
    path = os.path.join(d, "seq.fa")
    write_fasta(path, [("chr1", chr1), ("chr2", chr2)])
    return path


def _run(seq_fa, out_path, workdir, extra):
    rc = rm_main([
        seq_fa, "--output", out_path, "--markend",
        "--hspthresh", "1500", "--noentropy",
        "--wga_chunk_size", "512", "--lastz_interval_size", "700",
        "--seq_block_size", "1400", "--workdir", workdir] + extra)
    assert rc == 0
    with open(out_path, "rb") as f:
        return f.read()


def test_sharded_rm_cli_byte_identical(tmp_path):
    seq_fa = _make_genome(str(tmp_path))
    a = _run(seq_fa, str(tmp_path / "rep.seg"), str(tmp_path / "w1"), [])
    b = _run(seq_fa, str(tmp_path / "shd.seg"), str(tmp_path / "w2"),
             ["--sharded_table"])
    assert a.count(b"\n") > 2  # real intervals, not just markend
    assert a == b
