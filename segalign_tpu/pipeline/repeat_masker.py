"""Repeat-masker pipeline: self-alignment coverage intervals.

TPU-native equivalent of /root/reference/repeat_masker_src/: block planning
with neighbor-interval overlap windows (main.cpp:323-432), per-chunk
seed-filter-extend with in-window restriction, coverage accumulation
(seeder.cpp:153-188), and interval emission (segment_printer.cpp).

Reference quirks preserved:
  - coverage counts are uint8 and WRAP at 256 (seeder.cpp int_count);
  - an HSP covers len positions (the final scored position is excluded);
  - a covered run that touches the end of the block is never emitted;
  - when a block has less room than left_overlap, it starts at l, not 0.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass
from math import ceil
from typing import List

import numpy as np

from ..config import RMConfig
from ..io.fasta import read_fasta
from ..io.encode import encode, revcomp_codes
from ..io.blocks import Chrom
from ..constants import E_NT
from ..parallel.multi import MultiDeviceAligner, ChunkWork
from .pairwise import PipelineStats


@dataclass
class RMInterval:
    start: int
    end: int
    ref_start: int
    ref_end: int
    num_invoked: int
    num_intervals: int


@dataclass
class RMBlock:
    index: int
    start: int
    len: int
    intervals: List[RMInterval]


def load_rm_arena(path: str):
    """Whole-genome arena: chromosomes joined by '&'
    (repeat_masker_src/main.cpp:285-309)."""
    pieces = []
    chroms: List[Chrom] = []
    pos = 0
    sep = np.array([E_NT], dtype=np.uint8)
    for i, rec in enumerate(read_fasta(path)):
        codes = encode(rec.seq)
        chroms.append(Chrom(name=rec.name, file_idx=i, start=pos,
                            len=len(codes)))
        pieces.append(codes)
        pieces.append(sep)
        pos += len(codes) + 1
    codes = np.concatenate(pieces)[:-1] if pieces else np.zeros(0, np.uint8)
    return codes, chroms


def plan_rm_blocks(seq_len: int, cfg: RMConfig) -> List[RMBlock]:
    """Block + windowed-interval planning
    (repeat_masker_src/main.cpp:323-432)."""
    interval = cfg.lastz_interval_size
    total_intervals = ceil(seq_len / interval)
    num_neigh = ceil(cfg.neighbor_proportion * total_intervals)
    left_intervals = ceil((num_neigh - 1) / 2) if num_neigh > 0 else 0
    right_intervals = max(num_neigh - 1 - left_intervals, 0)
    left_overlap = left_intervals * interval
    right_overlap = right_intervals * interval
    max_iv_len = left_overlap + interval + right_overlap

    blocks: List[RMBlock] = []
    for l in range(0, seq_len, cfg.seq_block_size):
        block_start = l if l < left_overlap else l - left_overlap
        if l + cfg.seq_block_size + right_overlap > seq_len:
            block_len = seq_len - block_start
        else:
            block_len = (l - block_start) + cfg.seq_block_size + right_overlap

        start_pos = l - block_start
        if block_len < cfg.seq_block_size:
            end_pos = block_len - cfg.seed.size
        else:
            end_pos = start_pos + cfg.seq_block_size - cfg.seed.size

        ivs: List[RMInterval] = []
        p = start_pos
        while p < end_pos:
            iv_start = p
            iv_end = min(end_pos, iv_start + interval)
            left_lim = iv_start < left_overlap
            right_lim = (iv_end + right_overlap) > block_len
            if left_lim:
                ref_start = 0
                if right_lim:
                    ref_end = block_len
                else:
                    ref_end = (block_len if max_iv_len > block_len
                               else max_iv_len)
            else:
                if right_lim:
                    ref_end = block_len
                    ref_start = (0 if block_len < max_iv_len
                                 else block_len - max_iv_len)
                else:
                    ref_start = iv_start - left_overlap
                    ref_end = iv_end + right_overlap
            ivs.append(RMInterval(start=iv_start, end=iv_end,
                                  ref_start=ref_start, ref_end=ref_end,
                                  num_invoked=0, num_intervals=0))
            p += interval
        for k, iv in enumerate(ivs):
            iv.num_invoked = k + 1
            iv.num_intervals = len(ivs)
        blocks.append(RMBlock(index=len(blocks), start=block_start,
                              len=block_len, intervals=ivs))
    return blocks


def coverage_intervals(cov_diff: np.ndarray, block_len: int, M: int):
    """Run-length extraction of positions with coverage >= M
    (seeder.cpp:165-188). cov_diff is the +1/-1 difference array; coverage
    wraps as uint8."""
    cov = (np.cumsum(cov_diff[:block_len], dtype=np.int64) % 256)
    mask = cov >= M
    if not mask.any():
        return []
    m = mask.astype(np.int8)
    d = np.diff(m)
    starts = list(np.nonzero(d == 1)[0] + 1)
    ends = list(np.nonzero(d == -1)[0] + 1)  # exclusive end index
    if m[0]:
        starts.insert(0, 0)
    # a run still open at block end is LOST (reference quirk)
    return list(zip(starts[:len(ends)], ends))


def run_repeat_masker(cfg: RMConfig, out_dir: str,
                      aligner=None, resume: bool = False) -> PipelineStats:
    stats = PipelineStats()
    log = lambda msg: print(msg, file=sys.stderr, flush=True)

    log("\nReading target file ...")
    codes, chroms = load_rm_arena(cfg.seq_filename)
    seq_len = len(codes)
    chr_names = [c.name for c in chroms]
    chr_starts = np.array([c.start for c in chroms], dtype=np.int64)

    blocks = plan_rm_blocks(seq_len, cfg)

    if aligner is None:
        extra = {}
        if cfg.max_hits:
            extra["max_hits"] = cfg.max_hits
        if not cfg.use_pallas:
            extra["use_pallas"] = False  # default (True) = auto: Pallas on TPU
        aligner = MultiDeviceAligner(
            num_devices=cfg.num_devices,
            shape_pos=cfg.seed.shape_pos, seed_size=cfg.seed.size,
            transition=cfg.seed.transition, step=cfg.step,
            sub_mat=cfg.sub_mat, xdrop=cfg.xdrop, hspthresh=cfg.hspthresh,
            noentropy=cfg.noentropy, chunk_size=cfg.wga_chunk_size,
            rm_mode=True, **extra)

    do_plus = cfg.strand in ("plus", "both")
    do_minus = cfg.strand in ("minus", "both")

    from .manifest import Manifest
    manifest = Manifest(out_dir, resume=resume)

    t_start = time.time()
    log("\nStart alignment ...")
    for b in blocks:
        log(f"\nSending block {b.index} ...")
        block = codes[b.start:b.start + b.len]
        rc = revcomp_codes(block)
        t0 = time.time()
        aligner.set_ref(block)
        aligner.set_query(block, rc)
        stats.seed_table_ms += (time.time() - t0) * 1000

        for iv in b.intervals:
            key = (b.index, 0, iv.num_invoked)
            if manifest.is_done(key):
                stats.intervals_done += 1
                continue
            if cfg.debug:
                log(f"Chromosome block {b.index} interval "
                    f"{iv.num_invoked}/{iv.num_intervals} "
                    f"({b.start + iv.start}:{b.start + iv.end})")
            t1 = time.time()
            cov_diff = np.zeros(b.len + 1, dtype=np.int64)
            end_pos_rc = b.len - 1 - iv.start
            window = (iv.ref_start, iv.ref_end)
            work = []
            for cs in range(iv.start, iv.end, cfg.wga_chunk_size):
                ce = min(cs + cfg.wga_chunk_size, iv.end)
                if do_plus:
                    work.append(ChunkWork(cs, ce, False, window))
                if do_minus:
                    # (repeat_masker_src/seeder.cpp:117-119)
                    mcs = b.len - 1 - ce
                    mce = min(mcs + cfg.wga_chunk_size, end_pos_rc)
                    if mcs < mce:
                        work.append(ChunkWork(mcs, mce, True, window))
            for r in aligner.map_chunks(work):
                stats.num_seeds += r.num_seeds
                stats.num_seed_hits += r.num_hits
                stats.num_hsps += len(r.hsps)
                if len(r.hsps):
                    qs = r.hsps[:, 1]
                    ln = r.hsps[:, 2]
                    np.add.at(cov_diff, qs, 1)
                    np.add.at(cov_diff, qs + ln, -1)
            stats.extension_ms += (time.time() - t1) * 1000

            runs = coverage_intervals(cov_diff, b.len, cfg.M)
            if runs:
                path = os.path.join(
                    out_dir, f"tmp{iv.num_invoked}.block{b.index}.intervals")
                with open(path, "w") as f:
                    for (q0, q1) in runs:
                        seg_q = b.start + int(q0)
                        ci = int(np.searchsorted(chr_starts, seg_q,
                                                 side="right")) - 1
                        c0 = int(chr_starts[ci])
                        ln = int(q1 - q0)
                        f.write(f"{chr_names[ci]}\t{seg_q - c0}\t"
                                f"{seg_q + ln + 1 - c0}\n")
                    if cfg.markend:
                        f.write("# segalign_repeat_masker end-of-file\n")
            manifest.mark_done(key)
            stats.intervals_done += 1

    manifest.close()
    if cfg.debug:
        log(f"Time elapsed (complete pipeline): "
            f"{time.time() - t_start:.1f} sec")
        log(f"#seeds: {stats.num_seeds}")
        log(f"#seed hits: {stats.num_seed_hits}")
        log(f"#HSPs: {stats.num_hsps}")
    return stats
