"""Native gapped output formats: AXT and SAM writers."""

import numpy as np

from segalign_tpu.output.native_gapped import (
    Alignment, GenomeText, write_alignments, _cigar)
from segalign_tpu.io.fasta import write_fasta


def test_cigar_runs():
    assert _cigar(b"MMMIIMDDM") == "3M2I1M2D1M"
    assert _cigar(b"") == ""
    assert _cigar(b"M") == "1M"


def make_genomes(tmp_path):
    t = "ACGTACGTACGTACGTACGT"
    q = "TTACGTACGTACGTACGTAA"
    write_fasta(str(tmp_path / "t.fa"), [("t1", t)])
    write_fasta(str(tmp_path / "q.fa"), [("q1", q)])
    return (GenomeText(str(tmp_path / "t.fa")),
            GenomeText(str(tmp_path / "q.fa")), t, q)


def test_sam_and_axt(tmp_path):
    target, query, t, q = make_genomes(tmp_path)
    # align t[0:8] with q[2:10] (both 'ACGTACGT')
    al = Alignment(rname="t1", qname="q1", r_start=0, r_end=8, q_start=2,
                   q_end=10, strand="+", score=760, ops=b"M" * 8)

    p = str(tmp_path / "o.sam")
    write_alignments(p, "sam", [al], target, query)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("@HD")
    assert any(l.startswith("@SQ\tSN:t1\tLN:20") for l in lines)
    rec = lines[-1].split("\t")
    assert rec[0] == "q1" and rec[1] == "0" and rec[2] == "t1"
    assert rec[3] == "1" and rec[5] == "2H8M10H"
    assert rec[9] == "ACGTACGT"

    p2 = str(tmp_path / "o.softsam-")
    write_alignments(p2, "softsam-", [al], target, query)
    lines2 = open(p2).read().splitlines()
    assert not lines2[0].startswith("@")  # headerless variant
    rec2 = lines2[0].split("\t")
    assert rec2[5] == "2S8M10S"
    assert rec2[9] == q

    p3 = str(tmp_path / "o.axt")
    write_alignments(p3, "axt", [al], target, query)
    l3 = open(p3).read().splitlines()
    assert l3[0] == "0 t1 1 8 q1 3 10 + 760"
    assert l3[1] == "ACGTACGT" and l3[2] == "ACGTACGT"


def test_sam_minus_strand(tmp_path):
    target, query, t, q = make_genomes(tmp_path)
    al = Alignment(rname="t1", qname="q1", r_start=4, r_end=10, q_start=3,
                   q_end=9, strand="-", score=500, ops=b"M" * 6)
    p = str(tmp_path / "m.sam-")
    write_alignments(p, "sam-", [al], target, query)
    rec = open(p).read().splitlines()[0].split("\t")
    assert rec[1] == "16"
    # sequence comes from the reverse complement strand
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(q))
    assert rec[9] == rc[3:9]
