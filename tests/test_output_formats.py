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


def test_new_formats_smoke(tmp_path):
    """cigar / differences / rdotplot / text / lav writers produce
    well-formed output for a gapped alignment."""
    t = "ACGTACGTACGTACGTACGT"
    q = "TT" + t[0:4] + "G" + t[4:8] + "CCCCCCCCC"  # one insertion at q[6]
    write_fasta(str(tmp_path / "t.fa"), [("t1", t)])
    write_fasta(str(tmp_path / "q.fa"), [("q1", q)])
    target = GenomeText(str(tmp_path / "t.fa"))
    query = GenomeText(str(tmp_path / "q.fa"))
    al = Alignment(rname="t1", qname="q1", r_start=0, r_end=8, q_start=2,
                   q_end=11, strand="+", score=700, ops=b"MMMMIMMMM")

    p = str(tmp_path / "o.cigar")
    write_alignments(p, "cigar", [al], target, query)
    line = open(p).read().strip()
    assert line.startswith("cigar: q1 2 11 + t1 0 8 + 700 ")
    assert line.endswith("M 4 I 1 M 4")

    p = str(tmp_path / "o.diff")
    write_alignments(p, "differences", [al], target, query)
    rows = [l.split("\t") for l in open(p).read().splitlines()]
    # q has TT prefix then matches t with an extra base at q[6]
    assert any(r[8] == "-" for r in rows)  # the insertion row
    for r in rows:
        assert r[0] == "t1" and r[4] == "q1"

    p = str(tmp_path / "o.rdp")
    write_alignments(p, "rdotplot", [al], target, query)
    lines = open(p).read().splitlines()
    assert lines[0] == "t1\tq1"
    assert lines.count("NA\tNA") == 2  # two ungapped blocks

    p = str(tmp_path / "o.txt")
    write_alignments(p, "text", [al], target, query)
    body = open(p).read()
    assert "score = 700" in body and "t1" in body

    p = str(tmp_path / "o.lav")
    write_alignments(p, "lav", [al], target, query)
    body = open(p).read()
    assert body.startswith("#:lav\n")
    assert body.rstrip().endswith("#:eof")
    assert "s 700" in body and "b 1 3" in body and "e 8 11" in body
    assert body.count("  l ") == 2


def test_interference_index_matches_bruteforce():
    from segalign_tpu.output.native_gapped import _InterferenceIndex
    rng = np.random.default_rng(9)
    idx = _InterferenceIndex()
    kept = []
    for i in range(200):
        rs = int(rng.integers(0, 1 << 20))
        qs = int(rng.integers(0, 1 << 20))
        ln = int(rng.integers(1, 60_000))
        al = Alignment("r" + str(i % 3), "q" + str(i % 2), rs, rs + ln,
                       qs, qs + ln, "+", 100, b"")
        idx.add(al)
        kept.append(al)
    for _ in range(500):
        rn = "r" + str(int(rng.integers(0, 3)))
        qn = "q" + str(int(rng.integers(0, 2)))
        mr = int(rng.integers(0, 1 << 20))
        mq = int(rng.integers(0, 1 << 20))
        want = any(a.rname == rn and a.qname == qn and
                   a.r_start <= mr < a.r_end and a.q_start <= mq < a.q_end
                   for a in kept)
        assert idx.covered(rn, qn, mr, mq) == want


def test_trivial_self_alignment(tmp_path):
    from segalign_tpu.output.native_gapped import _trivial_alignments
    from segalign_tpu.output.scoring import default_gapped_matrix
    t = "ACGTACGTACGTACGTACGT"
    write_fasta(str(tmp_path / "t.fa"), [("c1", t), ("c2", t[::-1])])
    write_fasta(str(tmp_path / "q.fa"), [("c1", t), ("other", "AAAATTTT")])
    target = GenomeText(str(tmp_path / "t.fa"))
    query = GenomeText(str(tmp_path / "q.fa"))
    sub = default_gapped_matrix("")
    als = _trivial_alignments(target, query, sub)
    assert len(als) == 1
    al = als[0]
    assert al.rname == "c1" and al.qname == "c1"
    assert al.r_start == 0 and al.r_end == len(t)
    assert al.ops == b"M" * len(t)
    assert al.score == sum({"A": 91, "C": 100, "G": 100, "T": 91}[c]
                           for c in t)
