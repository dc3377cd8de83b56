"""End-to-end pairwise pipeline test with independent semantic validation.

Every emitted segment is re-scored from the raw FASTA sequences: the printed
score must equal the sum of substitution scores over the segment span
(exact, since --noentropy). Any coordinate-translation, strand, or
block-decomposition bug breaks this."""

import os

import numpy as np
import pytest

from segalign_tpu.config import Config, build_substitution_matrix
from segalign_tpu.io.fasta import write_fasta
from segalign_tpu.io.encode import encode, revcomp_codes
from segalign_tpu.pipeline.pairwise import run_pairwise

BASES = "ACGT"


def rand_dna(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


@pytest.fixture(scope="module")
def genomes(tmp_path_factory):
    rng = np.random.default_rng(123)
    d = tmp_path_factory.mktemp("genomes")
    core1 = rand_dna(rng, 500)
    core2 = rand_dna(rng, 400)
    # target: two chromosomes
    t_chr1 = rand_dna(rng, 700) + core1 + rand_dna(rng, 500)
    t_chr2 = rand_dna(rng, 300) + core2 + rand_dna(rng, 800)
    # query: three chromosomes; core2 appears reverse-complemented
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc_core2 = "".join(comp[c] for c in reversed(core2))
    q_chr1 = rand_dna(rng, 400) + core1 + rand_dna(rng, 300)
    q_chr2 = rand_dna(rng, 600) + rc_core2 + rand_dna(rng, 200)
    q_chr3 = rand_dna(rng, 900)
    ref_fa = str(d / "target.fa")
    query_fa = str(d / "query.fa")
    write_fasta(ref_fa, [("t_chr1", t_chr1), ("t_chr2", t_chr2)])
    write_fasta(query_fa, [("q_chr1", q_chr1), ("q_chr2", q_chr2),
                           ("q_chr3", q_chr3)])
    return dict(ref_fa=ref_fa, query_fa=query_fa,
                target={"t_chr1": t_chr1, "t_chr2": t_chr2},
                query={"q_chr1": q_chr1, "q_chr2": q_chr2, "q_chr3": q_chr3})


def run_pipeline(genomes, out_dir, **kw):
    cfg = Config(
        reference_filename=genomes["ref_fa"],
        query_filename=genomes["query_fa"],
        data_folder="", gapped=False, noentropy=True, hspthresh=1500,
        wga_chunk_size=512, lastz_interval_size=1000, seq_block_size=1500,
        device_hbuf=1024, device_batch=256, **kw)
    cmds = []
    stats = run_pairwise(cfg, out_dir, emit=cmds.append)
    return cfg, stats, cmds


def revcomp_str(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N",
            "a": "t", "c": "g", "g": "c", "t": "a", "n": "n"}
    return "".join(comp.get(c, c) for c in reversed(s))


def validate_segments(path_or_lines, genomes, hspthresh):
    sub = build_substitution_matrix(910)
    n = 0
    for line in path_or_lines:
        parts = line.strip().split("\t")
        assert len(parts) == 8, line
        rname, rs1, re1, qname, qs1, qe1, strand, score = parts
        rs1, re1, qs1, qe1, score = map(int, (rs1, re1, qs1, qe1, score))
        # printed end - start == the reference len field; the scored span is
        # len+1 positions (inclusive of both extremes)
        ln = re1 - rs1
        assert qe1 - qs1 == ln
        tseq = genomes["target"][rname]
        qseq = genomes["query"][qname]
        if strand == "-":
            qseq = revcomp_str(qseq)
        # 0-based inclusive span [rs1-1, rs1-1+ln]
        rsub = encode(tseq[rs1 - 1: rs1 + ln].encode())
        qsub = encode(qseq[qs1 - 1: qs1 + ln].encode())
        assert len(rsub) == ln + 1 and len(qsub) == ln + 1, line
        got = int(sub[rsub, qsub].sum())
        assert got == score, (line, got)
        assert score >= hspthresh
        n += 1
    return n


def test_e2e_segments_semantics(genomes, tmp_path):
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    cfg, stats, cmds = run_pipeline(genomes, out_dir)
    assert cmds == []  # nogapped
    assert stats.num_hsps > 0

    seg_files = [f for f in os.listdir(out_dir) if f.endswith(".segments")]
    assert seg_files
    total = 0
    strands = set()
    for f in seg_files:
        with open(os.path.join(out_dir, f)) as fh:
            lines = fh.readlines()
        assert lines
        total += validate_segments(lines, genomes, cfg.hspthresh)
        strands.add(f.rsplit(".", 2)[-2])
    assert strands == {"plus", "minus"}
    assert total >= 2

    # block name files exist (multi-block decomposition at 1500 bp)
    names = os.listdir(out_dir)
    assert "query_block0.name" in names and "query_block1.name" in names
    assert "ref_block0.name" in names


def test_e2e_finds_planted_homologies(genomes, tmp_path):
    out_dir = str(tmp_path / "out2")
    os.makedirs(out_dir)
    run_pipeline(genomes, out_dir)
    found_plus = found_minus = False
    for f in os.listdir(out_dir):
        if not f.endswith(".segments"):
            continue
        with open(os.path.join(out_dir, f)) as fh:
            for line in fh:
                p = line.split("\t")
                if p[0] == "t_chr1" and p[3] == "q_chr1" and p[6] == "+":
                    if int(p[2]) - int(p[1]) > 300:
                        found_plus = True
                if p[0] == "t_chr2" and p[3] == "q_chr2" and p[6] == "-":
                    if int(p[2]) - int(p[1]) > 250:
                        found_minus = True
    assert found_plus, "500bp plus-strand homology not found"
    assert found_minus, "400bp minus-strand homology not found"


def test_run_segalign_driver_nogapped(genomes, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from segalign_tpu.cli.run_segalign import main
    out = str(tmp_path / "result.segments")
    rc = main([genomes["ref_fa"], genomes["query_fa"], "--nogapped",
               "--output", out, "--markend", "--noentropy",
               "--hspthresh", "1500", "--wga_chunk_size", "512",
               "--lastz_interval_size", "1000", "--seq_block_size", "1500"])
    assert rc == 0
    with open(out) as f:
        lines = f.readlines()
    assert lines[-1] == "# segalign end-of-file\n"
    # plus lines come before minus lines (merge order)
    strands = [l.split("\t")[6] for l in lines[:-1]]
    if "-" in strands and "+" in strands:
        assert strands.index("-") > len(strands) - 1 - strands[::-1].index("+")
    validate_segments(lines[:-1], genomes, 1500)
    # temp dirs cleaned up
    assert not [d for d in os.listdir(tmp_path) if d.startswith("output_")]


def test_strand_selection(genomes, tmp_path):
    for strand, expect in (("plus", {"plus"}), ("minus", {"minus"})):
        out_dir = str(tmp_path / f"strand_{strand}")
        os.makedirs(out_dir)
        cfg = Config(
            reference_filename=genomes["ref_fa"],
            query_filename=genomes["query_fa"],
            data_folder="", gapped=False, noentropy=True, hspthresh=1500,
            wga_chunk_size=512, lastz_interval_size=1000,
            seq_block_size=1500, device_hbuf=1024, device_batch=256,
            strand=strand)
        run_pairwise(cfg, out_dir, emit=lambda c: None)
        kinds = {f.rsplit(".", 2)[-2] for f in os.listdir(out_dir)
                 if f.endswith(".segments")}
        assert kinds == expect, (strand, kinds)
