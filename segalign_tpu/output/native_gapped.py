"""Native gapped-extension stage (no-LASTZ mode).

Drives the C++ ydrop DP (native/gapped.cpp) over the segments files the
ungapped stage produced, replacing the LASTZ delegation step when lastz is
not installed. Semantics follow lastz's gapped stage functionally:

  - each segment is reduced to its midpoint anchor;
  - anchors are processed in decreasing segment-score order; an anchor whose
    point already lies inside a kept alignment (on both sequences) is
    skipped (interference);
  - each anchor is extended with affine-gap ydrop DP in both directions;
  - alignments scoring >= gappedthresh are emitted.

Output is valid MAF/AXT but NOT byte-identical to LASTZ; delegation mode
(run_segalign with lastz installed) remains the byte-compat path.
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from ..io.fasta import read_fasta
from ..native import gapped_extend_native
from .scoring import (default_gapped_matrix, parse_scoring_file,
                      encode_gapped, GAP_OPEN_DEFAULT, GAP_EXTEND_DEFAULT)

# raw-byte reverse complement preserving case (display text for '-' strand)
RAW_RC_LUT = np.arange(256, dtype=np.uint8)
for a, b in (("A", "T"), ("C", "G"), ("a", "t"), ("c", "g")):
    RAW_RC_LUT[ord(a)] = ord(b)
    RAW_RC_LUT[ord(b)] = ord(a)


@dataclass
class Alignment:
    rname: str
    qname: str
    r_start: int
    r_end: int
    q_start: int   # strand-local (rc coords when strand == '-')
    q_end: int
    strand: str
    score: int
    ops: bytes


class GenomeText:
    """Per-chromosome raw bytes + gapped codes (+ lazily built rc)."""

    def __init__(self, fasta_path: str):
        self.raw: Dict[str, np.ndarray] = {}
        self.codes: Dict[str, np.ndarray] = {}
        self.order: List[str] = []
        for rec in read_fasta(fasta_path):
            self.raw[rec.name] = rec.seq
            self.codes[rec.name] = encode_gapped(rec.seq)
            self.order.append(rec.name)
        self._rc_raw: Dict[str, np.ndarray] = {}
        self._rc_codes: Dict[str, np.ndarray] = {}

    def size(self, name: str) -> int:
        return len(self.raw[name])

    def rc_raw(self, name: str) -> np.ndarray:
        if name not in self._rc_raw:
            self._rc_raw[name] = RAW_RC_LUT[self.raw[name][::-1]]
        return self._rc_raw[name]

    def rc_codes(self, name: str) -> np.ndarray:
        if name not in self._rc_codes:
            self._rc_codes[name] = encode_gapped(self.rc_raw(name))
        return self._rc_codes[name]


def _parse_segments(path: str):
    segs = []
    with open(path) as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            if len(p) != 8:
                continue
            segs.append((p[0], int(p[1]), int(p[2]), p[3], int(p[4]),
                         int(p[5]), p[6], int(p[7])))
    return segs


def _extend_file(seg_path: str, target: GenomeText, query: GenomeText,
                 sub, gap_open, gap_extend, ydrop, gappedthresh
                 ) -> List[Alignment]:
    strand = "-" if ".minus" in seg_path else "+"
    segs = _parse_segments(seg_path)
    # decreasing segment score; stable for determinism
    segs.sort(key=lambda s: -s[7])

    kept: List[Alignment] = []
    for (rname, rs1, re1, qname, qs1, qe1, st, score) in segs:
        ln = re1 - rs1  # segment len field; span covers ln+1 positions
        mid_r = (rs1 - 1) + (ln + 1) // 2
        mid_q = (qs1 - 1) + (ln + 1) // 2
        covered = False
        for al in kept:
            if (al.rname == rname and al.qname == qname and
                    al.r_start <= mid_r < al.r_end and
                    al.q_start <= mid_q < al.q_end):
                covered = True
                break
        if covered:
            continue
        rcodes = target.codes[rname]
        qcodes = (query.rc_codes(qname) if strand == "-"
                  else query.codes[qname])
        r = gapped_extend_native(rcodes, qcodes, sub, gap_open, gap_extend,
                                 ydrop, mid_r, mid_q)
        if r is None:
            raise RuntimeError("native gapped library unavailable")
        g_score, g_rs, g_qs, g_re, g_qe, ops = r
        if g_score < gappedthresh or g_re <= g_rs:
            continue
        kept.append(Alignment(rname, qname, g_rs, g_re, g_qs, g_qe, strand,
                              g_score, ops))

    # deterministic output order: query chrom file order, then coordinates
    qorder = {n: i for i, n in enumerate(query.order)}
    kept.sort(key=lambda a: (qorder[a.qname], a.q_start, a.r_start,
                             -a.score))
    return kept


def _aligned_text(raw_r: np.ndarray, raw_q: np.ndarray, al: Alignment):
    rt, qt = [], []
    i, j = al.q_start, al.r_start
    for op in al.ops.decode():
        if op == "M":
            rt.append(chr(raw_r[j]))
            qt.append(chr(raw_q[i]))
            i += 1
            j += 1
        elif op == "I":
            rt.append("-")
            qt.append(chr(raw_q[i]))
            i += 1
        else:
            rt.append(chr(raw_r[j]))
            qt.append("-")
            j += 1
    return "".join(rt), "".join(qt)


def _cigar(ops: bytes) -> str:
    out = []
    prev = None
    n = 0
    for op in ops.decode():
        if op == prev:
            n += 1
        else:
            if prev:
                out.append(f"{n}{prev}")
            prev = op
            n = 1
    if prev:
        out.append(f"{n}{prev}")
    return "".join(out)


def write_alignments(path: str, fmt: str, alignments: List[Alignment],
                     target: GenomeText, query: GenomeText):
    sam = fmt in ("sam", "softsam", "sam-", "softsam-")
    with open(path, "w") as f:
        if fmt in ("maf", "maf+"):
            f.write("##maf version=1 scoring=segalign_tpu\n")
        if sam and not fmt.endswith("-"):
            f.write("@HD\tVN:1.5\tSO:unsorted\n")
            for name in target.order:
                f.write(f"@SQ\tSN:{name}\tLN:{target.size(name)}\n")
            f.write("@PG\tID:segalign_tpu\tPN:segalign_tpu\n")
        idx = 0
        for al in alignments:
            raw_r = target.raw[al.rname]
            raw_q = (query.rc_raw(al.qname) if al.strand == "-"
                     else query.raw[al.qname])
            rt, qt = _aligned_text(raw_r, raw_q, al)
            if fmt.startswith("maf"):
                f.write(f"a score={al.score}\n")
                f.write(f"s {al.rname} {al.r_start} "
                        f"{al.r_end - al.r_start} + "
                        f"{target.size(al.rname)} {rt}\n")
                f.write(f"s {al.qname} {al.q_start} "
                        f"{al.q_end - al.q_start} {al.strand} "
                        f"{query.size(al.qname)} {qt}\n\n")
            elif fmt == "axt":
                f.write(f"{idx} {al.rname} {al.r_start + 1} {al.r_end} "
                        f"{al.qname} {al.q_start + 1} {al.q_end} "
                        f"{al.strand} {al.score}\n{rt}\n{qt}\n\n")
            elif sam:
                soft = fmt.startswith("softsam")
                flag = 16 if al.strand == "-" else 0
                qsize = query.size(al.qname)
                # strand-local clip lengths
                pre = al.q_start
                post = qsize - al.q_end
                cig = _cigar(al.ops)
                if soft:
                    seq = bytes(raw_q).decode()
                    cl = (f"{pre}S" if pre else "") + cig + \
                        (f"{post}S" if post else "")
                else:
                    seq = bytes(raw_q[al.q_start:al.q_end]).decode()
                    cl = (f"{pre}H" if pre else "") + cig + \
                        (f"{post}H" if post else "")
                f.write(f"{al.qname}\t{flag}\t{al.rname}\t{al.r_start + 1}"
                        f"\t255\t{cl}\t*\t0\t0\t{seq}\t*\tAS:i:{al.score}"
                        f"\n")
            else:
                raise NotImplementedError(
                    f"native gapped mode supports maf/maf+/maf-/axt/sam/"
                    f"softsam; --format={fmt} requires lastz (delegation "
                    f"mode)")
            idx += 1


def run_native_gapped(cfg, out_dir: str, max_workers: int | None = None
                      ) -> int:
    """Extend every tmp*.segments in out_dir; writes tmp*.<fmt> next to
    them. Returns the number of output files written."""
    target = GenomeText(cfg.reference_filename)
    query = GenomeText(cfg.query_filename)

    if cfg.scoring_file:
        sub, gap_open, gap_extend = parse_scoring_file(cfg.scoring_file)
    else:
        sub = default_gapped_matrix(cfg.ambiguous)
        gap_open, gap_extend = GAP_OPEN_DEFAULT, GAP_EXTEND_DEFAULT

    seg_files = sorted(glob.glob(os.path.join(out_dir, "tmp*.segments")))

    def work(seg_path: str) -> int:
        als = _extend_file(seg_path, target, query, sub, gap_open,
                           gap_extend, cfg.ydrop, cfg.gappedthresh)
        out_path = seg_path[:-len(".segments")] + f".{cfg.output_format}"
        write_alignments(out_path, cfg.output_format, als, target, query)
        return 1

    n = 0
    with ThreadPoolExecutor(max_workers=max_workers or os.cpu_count()) as ex:
        for r in ex.map(work, seg_files):
            n += r
    return n
