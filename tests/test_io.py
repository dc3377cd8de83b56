import numpy as np

from segalign_tpu.io.encode import encode, revcomp_codes
from segalign_tpu.io.fasta import read_fasta, write_fasta
from segalign_tpu.io.blocks import build_arena, plan_intervals, chunk_interval
from segalign_tpu.io.fasta import FastaRecord
from segalign_tpu.constants import (
    A_NT, C_NT, G_NT, T_NT, L_NT, N_NT, X_NT, E_NT)


def test_encode_basic():
    codes = encode(b"ACGTacgtnN&Ryz-")
    assert list(codes) == [A_NT, C_NT, G_NT, T_NT, L_NT, L_NT, L_NT, L_NT,
                           N_NT, N_NT, E_NT, X_NT, X_NT, X_NT, X_NT]


def test_revcomp_codes():
    codes = encode(b"ACGTn&a")
    rc = revcomp_codes(codes)
    assert list(rc) == [L_NT, E_NT, N_NT, A_NT, C_NT, G_NT, T_NT]


def test_fasta_roundtrip(tmp_path):
    p = str(tmp_path / "x.fa")
    write_fasta(p, [("chr1 extra desc", "ACGTACGT"), ("chr2", "acgtNNN")])
    recs = list(read_fasta(p))
    assert [r.name for r in recs] == ["chr1", "chr2"]
    assert bytes(recs[0].seq) == b"ACGTACGT"
    assert bytes(recs[1].seq) == b"acgtNNN"


def test_fasta_gzip(tmp_path):
    import gzip
    p = str(tmp_path / "x.fa.gz")
    with gzip.open(p, "wb") as f:
        f.write(b">c1\nACGT\nACGT\n>c2\nTTTT\n")
    recs = list(read_fasta(p))
    assert bytes(recs[0].seq) == b"ACGTACGT"
    assert bytes(recs[1].seq) == b"TTTT"


def _recs(*seqs):
    return [FastaRecord(name=f"chr{i}", seq=np.frombuffer(s, dtype=np.uint8))
            for i, s in enumerate(seqs)]


def test_arena_single_block():
    arena = build_arena(_recs(b"ACGT", b"TTTT"), seq_block_size=100,
                        with_rc=True)
    # layout: chr0 & chr1 (& trailing excluded from block len)
    assert len(arena.blocks) == 1
    b = arena.blocks[0]
    assert b.start == 0 and b.len == 9
    assert arena.chroms[0].start == 0 and arena.chroms[1].start == 5
    assert list(arena.codes[:9]) == [A_NT, C_NT, G_NT, T_NT, E_NT,
                                     T_NT, T_NT, T_NT, T_NT]
    # arena retains the trailing separator byte
    assert len(arena.codes) == 10 and arena.codes[9] == E_NT
    # rc of block: revcomp("ACGT&TTTT") = "AAAA&ACGT"
    assert list(arena.rc_codes) == [A_NT, A_NT, A_NT, A_NT, E_NT,
                                    A_NT, C_NT, G_NT, T_NT]
    # rc chrom table: chr order reversed, starts per reference formula
    assert arena.rc_chroms[0].name == "chr1"
    assert arena.rc_chroms[0].start == 0
    assert arena.rc_chroms[1].name == "chr0"
    assert arena.rc_chroms[1].start == 5


def test_arena_multi_block():
    # block closes when len exceeds seq_block_size; closing chr has no
    # trailing separator
    arena = build_arena(_recs(b"AAAAAA", b"CCCC", b"GG"), seq_block_size=5,
                        with_rc=True)
    # AAAAAA (6>5) closes block 0; CCCC&GG (7>5) closes block 1
    assert len(arena.blocks) == 2
    assert [b.start for b in arena.blocks] == [0, 6]
    assert [b.len for b in arena.blocks] == [6, 7]
    # rc arena block starts coincide with forward block starts
    assert len(arena.rc_codes) == 13
    assert list(arena.rc_codes[0:6]) == [T_NT] * 6
    # rc("CCCC&GG") = "CC&GGGG"
    assert list(arena.rc_codes[6:13]) == [C_NT, C_NT, E_NT] + [G_NT] * 4
    # rc chrom table for block 1: chr2 (GG) first then chr1 (CCCC)
    names = [c.name for c in arena.rc_chroms]
    assert names == ["chr0", "chr2", "chr1"]
    assert arena.rc_chroms[1].start == 2 * 6 + 7 - 11 - 2  # == 6
    assert arena.rc_chroms[2].start == 2 * 6 + 7 - 6 - 4   # == 9


def test_plan_intervals():
    arena = build_arena(_recs(b"A" * 100), seq_block_size=1000, with_rc=False)
    ivs = plan_intervals(arena.blocks, seed_size=19, interval_size=30)
    assert [(iv.start, iv.end) for iv in ivs] == [(0, 30), (30, 60), (60, 81)]
    assert [iv.num_invoked for iv in ivs] == [1, 2, 3]
    assert all(iv.num_intervals == 3 for iv in ivs)


def test_chunk_interval():
    assert list(chunk_interval(0, 95, 30)) == [(0, 30), (30, 60), (60, 90),
                                               (90, 95)]
