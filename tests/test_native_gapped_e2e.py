"""End-to-end native gapped mode: run_segalign --gapped_mode=native
produces MAF whose blocks are internally consistent with the input FASTA."""

import os

import numpy as np
import pytest

from segalign_tpu.io.fasta import write_fasta
from segalign_tpu.output.scoring import default_gapped_matrix

BASES = "ACGT"


def rand_dna(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def revcomp_str(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp.get(c, c) for c in reversed(s))


@pytest.fixture(scope="module")
def genomes(tmp_path_factory):
    rng = np.random.default_rng(99)
    d = tmp_path_factory.mktemp("native_gapped")
    core = rand_dna(rng, 600)
    # query carries the core with a 15bp deletion and some point mutations:
    # the ungapped stage finds two HSPs; gapped extension bridges them.
    qcore = list(core[:300] + core[315:])
    for p in (50, 150, 400):
        qcore[p] = "ACGT"[("ACGT".index(qcore[p]) + 1) % 4]
    qcore = "".join(qcore)
    t_chr = rand_dna(rng, 400) + core + rand_dna(rng, 400)
    q_chr1 = rand_dna(rng, 250) + qcore + rand_dna(rng, 300)
    q_chr2 = rand_dna(rng, 200) + revcomp_str(core) + rand_dna(rng, 250)
    ref_fa = str(d / "t.fa")
    query_fa = str(d / "q.fa")
    write_fasta(ref_fa, [("tchr", t_chr)])
    write_fasta(query_fa, [("qchr1", q_chr1), ("qchr2", q_chr2)])
    return dict(ref_fa=ref_fa, query_fa=query_fa, t_chr=t_chr,
                q_chr1=q_chr1, q_chr2=q_chr2)


def parse_maf(path):
    blocks = []
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    i = 0
    while i < len(lines):
        if lines[i].startswith("a "):
            score = int(lines[i].split("score=")[1])
            s1 = lines[i + 1].split()
            s2 = lines[i + 2].split()
            blocks.append((score, s1, s2))
            i += 3
        else:
            i += 1
    return blocks


def test_native_gapped_maf(genomes, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from segalign_tpu.cli.run_segalign import main
    out = str(tmp_path / "out.maf")
    rc = main([genomes["ref_fa"], genomes["query_fa"], "--gapped_mode",
               "native", "--output", out, "--hspthresh", "1800",
               "--gappedthresh", "3000", "--wga_chunk_size", "512",
               "--lastz_interval_size", "1000", "--format", "maf-"])
    assert rc == 0
    blocks = parse_maf(out)
    assert blocks, "no MAF blocks produced"

    seqs = {"tchr": genomes["t_chr"], "qchr1": genomes["q_chr1"],
            "qchr2": genomes["q_chr2"]}
    sub = default_gapped_matrix()
    lut = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    found_gap_bridge = False
    found_minus = False
    for score, s1, s2 in blocks:
        for s in (s1, s2):
            name, start, size, strand, src_size, text = (
                s[1], int(s[2]), int(s[3]), s[4], int(s[5]), s[6])
            assert src_size == len(seqs[name])
            seq = seqs[name]
            if strand == "-":
                seq = revcomp_str(seq)
            assert text.replace("-", "") == seq[start:start + size], (
                name, start, size, strand)
        # recompute score from the aligned text
        t1, t2 = s1[6], s2[6]
        assert len(t1) == len(t2)
        got = 0
        prev = None
        for a, b in zip(t1, t2):
            if a == "-" or b == "-":
                got -= 30 + (400 if prev != "-gap" else 0)
                prev = "-gap"
            else:
                got += int(sub[lut.get(a.upper(), 5), lut.get(b.upper(), 5)])
                prev = None
        assert got == score, (got, score)
        assert score >= 3000
        if "-" in t1 or "-" in t2:
            found_gap_bridge = True
        if s2[4] == "-":
            found_minus = True
    assert found_gap_bridge, "gapped alignment did not bridge the indel"
    assert found_minus, "minus-strand alignment missing"
