"""End-to-end repeat-masker test vs an oracle-driven reimplementation."""

import os

import numpy as np
import pytest

from segalign_tpu.config import RMConfig, make_seed_config
from segalign_tpu.io.fasta import write_fasta
from segalign_tpu.io.encode import revcomp_codes
from segalign_tpu.oracle import reference as oracle
from segalign_tpu.pipeline.repeat_masker import (
    load_rm_arena, plan_rm_blocks, run_repeat_masker, coverage_intervals)

BASES = "ACGT"


def rand_dna(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


@pytest.fixture(scope="module")
def rm_genome(tmp_path_factory):
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("rm")
    rep = rand_dna(rng, 250)
    chr1 = (rand_dna(rng, 300) + rep + rand_dna(rng, 200) + rep +
            rand_dna(rng, 300))
    chr2 = rand_dna(rng, 250) + rep + rand_dna(rng, 350)
    path = str(d / "seq.fa")
    write_fasta(path, [("chr1", chr1), ("chr2", chr2)])
    return path


def make_cfg(rm_genome, **kw):
    kw.setdefault("hspthresh", 1500)
    kw.setdefault("noentropy", True)
    kw.setdefault("wga_chunk_size", 512)
    kw.setdefault("lastz_interval_size", 700)
    kw.setdefault("seq_block_size", 1400)
    return RMConfig(seq_filename=rm_genome, **kw)


def oracle_rm_intervals(cfg, codes, chroms):
    """Independent end-to-end RM using the NumPy oracle components."""
    seq_len = len(codes)
    blocks = plan_rm_blocks(seq_len, cfg)
    sc = cfg.seed
    out = {}
    for b in blocks:
        block = codes[b.start:b.start + b.len]
        rc = revcomp_codes(block)
        it, pt = oracle.generate_seed_pos_table(
            block, cfg.step, sc.shape_pos, sc.size, sc.kmer_size)
        it = it.astype(np.int64)
        for iv in b.intervals:
            cov = np.zeros(b.len + 1, dtype=np.int64)
            end_pos_rc = b.len - 1 - iv.start
            for cs in range(iv.start, iv.end, cfg.wga_chunk_size):
                ce = min(cs + cfg.wga_chunk_size, iv.end)
                for rev, (s0, s1) in (
                        (False, (cs, ce)),
                        (True, (b.len - 1 - ce,
                                min(b.len - 1 - ce + cfg.wga_chunk_size,
                                    end_pos_rc)))):
                    if s0 >= s1:
                        continue
                    qarr = rc if rev else block
                    seeds = oracle.extract_seed_offsets(
                        qarr, 0, s0, s1, sc.size, sc.shape_pos,
                        sc.transition)
                    if not seeds:
                        continue
                    hsps, _ = oracle.seed_and_filter(
                        seeds, it, pt, block, qarr, sc.size, cfg.sub_mat,
                        cfg.xdrop, cfg.hspthresh, cfg.noentropy,
                        10**12, window=(iv.ref_start, iv.ref_end),
                        rm_mode=True, rev=rev)
                    for h in hsps:
                        cov[h.query_start] += 1
                        cov[h.query_start + h.len] -= 1
            runs = coverage_intervals(cov, b.len, cfg.M)
            if runs:
                out[(iv.num_invoked, b.index)] = runs
    return out


def test_rm_e2e_matches_oracle(rm_genome, tmp_path):
    cfg = make_cfg(rm_genome)
    codes, chroms = load_rm_arena(rm_genome)
    expected = oracle_rm_intervals(cfg, codes, chroms)
    assert expected, "oracle found no repeat intervals - test data too weak"

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    from segalign_tpu.pipeline.device import DeviceAligner
    al = DeviceAligner(
        shape_pos=cfg.seed.shape_pos, seed_size=cfg.seed.size,
        transition=cfg.seed.transition, step=cfg.step, sub_mat=cfg.sub_mat,
        xdrop=cfg.xdrop, hspthresh=cfg.hspthresh, noentropy=cfg.noentropy,
        chunk_size=cfg.wga_chunk_size, HBUF=1024, B=256, rm_mode=True)
    run_repeat_masker(cfg, out_dir, aligner=al)

    chr_starts = np.array([c.start for c in chroms])
    names = [c.name for c in chroms]
    got = {}
    for f in os.listdir(out_dir):
        if f == "MANIFEST.jsonl":
            continue
        assert f.startswith("tmp") and f.endswith(".intervals")
        num_invoked = int(f[3:].split(".")[0])
        block_index = int(f.split(".block")[1].split(".")[0])
        lines = open(os.path.join(out_dir, f)).read().splitlines()
        got[(num_invoked, block_index)] = lines

    # rebuild expected lines
    blocks = plan_rm_blocks(len(codes), cfg)
    exp_lines = {}
    for (ninv, bidx), runs in expected.items():
        b = blocks[bidx]
        lines = []
        for (q0, q1) in runs:
            seg_q = b.start + int(q0)
            ci = int(np.searchsorted(chr_starts, seg_q, side="right")) - 1
            c0 = int(chr_starts[ci])
            lines.append(f"{names[ci]}\t{seg_q - c0}\t"
                         f"{seg_q + (q1 - q0) + 1 - c0}")
        exp_lines[(ninv, bidx)] = lines

    assert got == exp_lines


def test_rm_driver(rm_genome, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from segalign_tpu.cli.run_segalign_repeat_masker import main
    out = str(tmp_path / "seq.seg")
    rc = main([rm_genome, "--output", out, "--markend",
               "--noentropy", "--hspthresh", "1500",
               "--wga_chunk_size", "512", "--lastz_interval_size", "700",
               "--seq_block_size", "1400"])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert lines[0] == "#name1  zstart1 end1  name2 zstart2+  end2+"
    assert lines[-1] == "# segalign_repeat_masker end-of-file"
    body = [l for l in lines[1:-1]
            if not l.startswith("#")]
    assert body, "no repeat intervals in driver output"
    for l in body:
        chrom, s, e = l.split("\t")
        assert chrom in ("chr1", "chr2") and int(e) > int(s)


def test_sparse_coverage_matches_dense():
    """coverage_runs_sparse == coverage_intervals (the dense oracle) on
    random HSP sets including uint8 wrap and end-of-block runs."""
    import numpy as np
    from segalign_tpu.pipeline.repeat_masker import (coverage_intervals,
                                                     coverage_runs_sparse)
    rng = np.random.default_rng(21)
    for trial in range(30):
        block_len = int(rng.integers(50, 3000))
        n = int(rng.integers(0, 400))
        qs = rng.integers(0, block_len, n).astype(np.int64)
        ln = rng.integers(1, 50, n).astype(np.int64)
        ends = np.minimum(qs + ln, block_len)
        M = int(rng.integers(1, 4))
        if trial % 5 == 0 and block_len > 20:
            # force uint8 wrap: 300 HSPs covering the same span
            extra = np.full(300, 5, np.int64)
            qs = np.concatenate([qs, extra])
            ends = np.concatenate([ends, extra + 10])
        if trial % 7 == 0:
            # a run touching block end (must be dropped)
            qs = np.concatenate([qs, [block_len - 8]])
            ends = np.concatenate([ends, [block_len]])
        diff = np.zeros(block_len + 1, np.int64)
        np.add.at(diff, qs, 1)
        np.add.at(diff, ends, -1)
        want = coverage_intervals(diff, block_len, M)
        got = coverage_runs_sparse(qs, ends, block_len, M)
        assert [tuple(map(int, r)) for r in got] == \
            [tuple(map(int, r)) for r in want], (trial, block_len, M)
