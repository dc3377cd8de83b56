"""NumPy golden model of the reference GPU semantics.

Every function here is a literal, scalar re-implementation of the CUDA/C++
reference, used as the correctness oracle for the JAX/Pallas fast paths.
Citations point into /root/reference/.

Known, deliberate deviations from the reference (documented once here):

  1. pos_table bucket order. The reference fills each k-mer bucket in
     TBB-thread interleaving order (seed_pos_table.cu:69-81), which is
     nondeterministic run to run. We use ascending position order. The final
     HSP set is unaffected (dedup sorts with full tie-breaking).
  2. Entropy match counts only track A/C/G/T (codes 0-3). The reference
     indexes `short count[4]` with the raw code (seed_filter.cu:444-451),
     which is out-of-bounds UB for matches of codes >= 4 (L.L, N.N, X.X,
     E.E pairs). Under default scoring such matches always score <= -100 and
     terminate extension before entering an extent (xdrop=910 < 1000), so
     behaviour is provably identical; with --ambiguous=... and N runs the
     reference behaviour is undefined and we pick the sane reading.
  3. A hit batch with zero hits is skipped. The reference reads one element
     before the d_done array in that case (seed_filter.cu:771) — UB that can
     duplicate the previous batch's output.
  4. Out-of-bounds lanes reuse "stale" characters from the previous tile in
     the CUDA entropy counting (registers keep old values). We read nothing
     out of bounds; this only matters within 32 bases of the arena ends and
     never under default scoring (see 2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..constants import INVALID_KMER, TRANSITION_MASK


@dataclass
class SegmentPair:
    ref_start: int
    query_start: int
    len: int
    score: int

    def astuple(self):
        return (self.ref_start, self.query_start, self.len, self.score)


# ---------------------------------------------------------------------------
# Seed position table (common/seed_pos_table.cu:49-109)

def generate_seed_pos_table(ref_codes: np.ndarray, step: int,
                            shape_pos, seed_size: int, kmer_size: int
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Build (index_table, pos_table) for one reference block.

    index_table[k] = number of table positions with kmer <= k (inclusive
    cumulative counts, length 4**kmer_size) — matching the device table,
    which is the cumsum shifted so that bucket k spans
    [index_table[k-1], index_table[k]).
    pos_table holds block-relative positions, bucket-major, ascending within
    a bucket (deviation 1 above).

    Position set: start_offset + i*step for i in [0, num_steps), where
    offset = (seed_size+1) % step and start_offset = step - offset
    (seed_pos_table.cu:58-64). With the default step=1 this starts at
    position 1 — position 0 is never indexed; quirk preserved.
    """
    assert 3 < kmer_size <= 15
    ref_len = len(ref_codes)
    offset = (seed_size + 1) % step
    start_offset = step - offset
    num_steps = (ref_len - seed_size + offset) // step

    positions = start_offset + step * np.arange(num_steps, dtype=np.int64)
    kmers = kmers_at(ref_codes, positions, shape_pos, seed_size)
    valid = kmers != INVALID_KMER
    positions = positions[valid]
    kmers = kmers[valid]

    index_table = np.zeros(4 ** kmer_size, dtype=np.int64)
    np.add.at(index_table, kmers, 1)
    index_table = np.cumsum(index_table)

    order = np.argsort(kmers, kind="stable")
    pos_table = positions[order].astype(np.uint32)
    return index_table.astype(np.uint32), pos_table


def kmers_at(codes: np.ndarray, positions: np.ndarray, shape_pos,
             seed_size: int) -> np.ndarray:
    """Vectorized GetKmerIndexAtPos (common/ntcoding.cpp:43-61).

    A window is valid only if ALL seed_size characters (including don't-care
    columns) are uppercase ACGT (codes 0-3); otherwise INVALID_KMER.
    The kmer packs sampled columns big-endian, 2 bits each.
    """
    positions = np.asarray(positions, dtype=np.int64)
    n = len(codes)
    ok = positions + seed_size <= n
    valid = ok.copy()
    kmer = np.zeros(len(positions), dtype=np.uint32)
    safe_pos = np.where(ok, positions, 0)
    for i in range(seed_size):
        c = codes[np.minimum(safe_pos + i, n - 1)]
        valid &= ok & (c < 4)
    for p in shape_pos:
        c = codes[np.minimum(safe_pos + p, n - 1)]
        kmer = (kmer << 2) | (c.astype(np.uint32) & 3)
    return np.where(valid, kmer, np.uint32(INVALID_KMER))


# ---------------------------------------------------------------------------
# Query seeding (src/seeder.cpp:47-121)

def extract_seed_offsets(codes: np.ndarray, block_start: int, start: int,
                         end: int, seed_size: int, shape_pos,
                         transition: bool) -> List[Tuple[int, int]]:
    """(kmer, block-relative position) pairs for one wga chunk, in the
    reference's enumeration order: for each position, the base kmer then the
    one-transition variants for t = 0..kmer_size-1 (which XOR bit pair 2t,
    i.e. the LAST sampled column first; src/seeder.cpp:64-72)."""
    out: List[Tuple[int, int]] = []
    k = len(shape_pos)
    positions = np.arange(start, end, dtype=np.int64)
    kmers = kmers_at(codes, block_start + positions, shape_pos, seed_size)
    for j, kmer in zip(positions, kmers):
        if kmer == INVALID_KMER:
            continue
        out.append((int(kmer), int(j)))
        if transition:
            for t in range(k):
                out.append((int(kmer) ^ (TRANSITION_MASK << (2 * t)), int(j)))
    return out


# ---------------------------------------------------------------------------
# Ungapped x-drop extension (src/seed_filter.cu:232-652), literal tile-32 loop

def extend_hit_tile32(ref: np.ndarray, query: np.ndarray, ref_loc: int,
                      query_loc: int, sub: np.ndarray, xdrop: int,
                      hspthresh: int, noentropy: bool):
    """Literal re-implementation of one warp's find_hsps work.

    Returns (accepted, ref_start, query_start, length, score).
    """
    warp = 32
    ref_len = len(ref)
    query_len = len(query)
    count = np.zeros(4, dtype=np.int64)
    count_del = np.zeros(4, dtype=np.int64)

    total_score = 0
    entropy = 1.0

    # ---- right extension
    tile = 0
    xdrop_found = False
    edge_found = False
    prev_score = 0
    prev_max_score = 0
    prev_max_pos = -1
    extent = 0

    while not xdrop_found and not edge_found:
        pos = tile + np.arange(warp)
        ref_pos = ref_loc + pos
        query_pos = query_loc + pos
        inb = (ref_pos < ref_len) & (query_pos < query_len)
        r = np.where(inb, ref[np.minimum(ref_pos, ref_len - 1)], 0)
        q = np.where(inb, query[np.minimum(query_pos, query_len - 1)], 0)
        sc = np.where(inb, sub[r, q], 0).astype(np.int64)
        cum = np.cumsum(sc) + prev_score

        # per-lane candidate: strict improvement over the previous tile max
        cand_v = np.where(cum > prev_max_score, cum, prev_max_score)
        cand_p = np.where(cum > prev_max_score, pos, prev_max_pos)
        # inclusive prefix-max, ties to the earlier lane
        m_v = cand_v.copy()
        m_p = cand_p.copy()
        for i in range(1, warp):
            if m_v[i - 1] >= m_v[i]:
                m_v[i] = m_v[i - 1]
                m_p[i] = m_p[i - 1]
        drop = (m_v - cum) > xdrop
        drop_any = np.logical_or.accumulate(drop)
        # lanes at/after a drop revert to the previous tile's max
        f_v = np.where(drop_any, prev_max_score, cand_v)
        f_p = np.where(drop_any, prev_max_pos, cand_p)
        for i in range(1, warp):
            if f_v[i - 1] >= f_v[i]:
                f_v[i] = f_v[i - 1]
                f_p[i] = f_p[i - 1]
        max_v = int(f_v[-1])
        max_p = int(f_p[-1])
        new_max_found = max_p > prev_max_pos

        if drop_any[-1]:
            total_score += max_v
            xdrop_found = True
            extent = max_p
            new_prev_max_pos = max_p
        elif ref_pos[-1] >= ref_len or query_pos[-1] >= query_len:
            total_score += max_v
            edge_found = True
            extent = max_p
            new_prev_max_pos = max_p
        else:
            prev_score = int(cum[-1])
            prev_max_score = max_v
            new_prev_max_pos = max_p
        if new_max_found:
            count += count_del
            count_del[:] = 0
        match = inb & (r == q) & (r < 4)
        in_max = pos <= new_prev_max_pos
        for c in range(4):
            count[c] += int(np.sum(match & in_max & (r == c)))
            count_del[c] += int(np.sum(match & ~in_max & (r == c)))
        prev_max_pos = new_prev_max_pos
        tile += warp

    # ---- left extension
    tile = 0
    xdrop_found = False
    edge_found = False
    prev_score = 0
    prev_max_score = 0
    prev_max_pos = 0
    left_extent = 0
    count_del[:] = 0

    while not xdrop_found and not edge_found:
        pos = tile + 1 + np.arange(warp)
        inb = (ref_loc >= pos) & (query_loc >= pos)
        ref_pos = np.where(inb, ref_loc - pos, 0)
        query_pos = np.where(inb, query_loc - pos, 0)
        r = np.where(inb, ref[ref_pos], 0)
        q = np.where(inb, query[query_pos], 0)
        sc = np.where(inb, sub[r, q], 0).astype(np.int64)
        cum = np.cumsum(sc) + prev_score

        cand_v = np.where(cum > prev_max_score, cum, prev_max_score)
        cand_p = np.where(cum > prev_max_score, pos, prev_max_pos)
        m_v = cand_v.copy()
        m_p = cand_p.copy()
        for i in range(1, warp):
            if m_v[i - 1] >= m_v[i]:
                m_v[i] = m_v[i - 1]
                m_p[i] = m_p[i - 1]
        drop = (m_v - cum) > xdrop
        drop_any = np.logical_or.accumulate(drop)
        f_v = np.where(drop_any, prev_max_score, cand_v)
        f_p = np.where(drop_any, prev_max_pos, cand_p)
        for i in range(1, warp):
            if f_v[i - 1] >= f_v[i]:
                f_v[i] = f_v[i - 1]
                f_p[i] = f_p[i - 1]
        max_v = int(f_v[-1])
        max_p = int(f_p[-1])
        new_max_found = max_p > prev_max_pos

        if drop_any[-1]:
            total_score += max_v
            xdrop_found = True
            left_extent = max_p
            extent += left_extent
            new_prev_max_pos = max_p
        elif ref_loc < pos[-1] or query_loc < pos[-1]:
            total_score += max_v
            edge_found = True
            left_extent = max_p
            extent += left_extent
            new_prev_max_pos = max_p
        else:
            prev_score = int(cum[-1])
            prev_max_score = max_v
            new_prev_max_pos = max_p
        if new_max_found:
            count += count_del
            count_del[:] = 0
        match = inb & (r == q) & (r < 4)
        in_max = pos <= new_prev_max_pos
        for c in range(4):
            count[c] += int(np.sum(match & in_max & (r == c)))
            count_del[c] += int(np.sum(match & ~in_max & (r == c)))
        prev_max_pos = new_prev_max_pos
        tile += warp

    # ---- entropy adjustment (src/seed_filter.cu:608-625)
    if hspthresh <= total_score <= 3 * hspthresh and not noentropy:
        total_matches = int(count.sum())
        if total_matches >= 20:
            ext1 = float(extent + 1)
            e = 0.0
            for c in range(4):
                if count[c] != 0:
                    e += (count[c] / ext1) * np.log(count[c] / ext1)
            entropy = -e / np.log(4.0)

    adjusted = int(np.float32(total_score) * entropy)
    if adjusted >= hspthresh:
        score = total_score
        if entropy > 0:
            score = int(total_score * entropy)
        return True, ref_loc - left_extent, query_loc - left_extent, extent, score
    return False, ref_loc, query_loc, 0, 0


# ---------------------------------------------------------------------------
# Dedup chains (src/seed_filter.cu:47-108,769-782)

U32 = 1 << 32


def _diag(h: SegmentPair) -> int:
    # uint32 wraparound of ref_start - query_start, compared unsigned
    return (h.ref_start - h.query_start) % U32


def hsp_comp_key(h: SegmentPair):
    """hspComp: diagonal, ref_start, len ascending; score descending."""
    return (_diag(h), h.ref_start, h.len, -h.score)


def hsp_comp_lastz_key(h: SegmentPair):
    """hspCompLastz: query_start, ref_start, len ascending; score desc."""
    return (h.query_start, h.ref_start, h.len, -h.score)


def hsp_equal(x: SegmentPair, y: SegmentPair) -> bool:
    """Same-diagonal mutual containment (src/seed_filter.cu:47-52)."""
    if _diag(x) != _diag(y):
        return False
    return ((x.ref_start >= y.ref_start and x.ref_start + x.len <= y.ref_start + y.len)
            or (y.ref_start >= x.ref_start and y.ref_start + y.len <= x.ref_start + x.len))


def unique_chain(hsps: List[SegmentPair], equal) -> List[SegmentPair]:
    """thrust::unique_copy semantics: keep an element unless `equal` to the
    last KEPT element."""
    out: List[SegmentPair] = []
    for h in hsps:
        if not out or not equal(out[-1], h):
            out.append(h)
    return out


def dedup_batch(hsps: List[SegmentPair]) -> List[SegmentPair]:
    """Pairwise-mode dedup of one iteration batch."""
    s = sorted(hsps, key=hsp_comp_key)
    u = unique_chain(s, hsp_equal)
    return sorted(u, key=hsp_comp_lastz_key)


# ---------------------------------------------------------------------------
# SeedAndFilter (src/seed_filter.cu:682-828)

def plan_hit_batches(cum_hits: np.ndarray, max_hits: int):
    """The iteration-batching boundaries (seed_filter.cu:718-745).

    cum_hits: inclusive cumsum of per-seed hit counts. Returns a list of
    (start_seed, end_seed_inclusive, start_hit, end_hit) per batch.
    """
    num_seeds = len(cum_hits)
    num_hits = int(cum_hits[-1]) if num_seeds else 0
    if num_hits < max_hits:
        num_iter = 2
        iter_hit_limit = num_hits
    else:
        num_iter = num_hits // max_hits + 2
        iter_hit_limit = max_hits
    limit_pos = np.zeros(num_iter, dtype=np.int64)
    for i in range(num_iter - 1):
        pos = int(np.searchsorted(cum_hits, iter_hit_limit, side="left")) - 1
        limit_pos[i] = pos
        iter_hit_limit = int(cum_hits[pos]) + max_hits if pos >= 0 else max_hits
        if iter_hit_limit > num_hits:
            iter_hit_limit = num_hits
    limit_pos[num_iter - 1] = num_seeds - 1
    if num_iter >= 2 and limit_pos[num_iter - 1] == limit_pos[num_iter - 2]:
        num_iter -= 1

    batches = []
    start_seed = 0
    start_hit = 0
    for i in range(num_iter):
        end_seed = int(limit_pos[i])
        end_hit = int(cum_hits[end_seed]) if end_seed >= 0 else 0
        batches.append((start_seed, end_seed, start_hit, end_hit))
        start_seed = end_seed + 1
        start_hit = end_hit
    return batches


def seed_and_filter(seed_offsets: List[Tuple[int, int]],
                    index_table: np.ndarray, pos_table: np.ndarray,
                    ref: np.ndarray, query: np.ndarray, seed_size: int,
                    sub: np.ndarray, xdrop: int, hspthresh: int,
                    noentropy: bool, max_hits: int,
                    window: Tuple[int, int] | None = None,
                    rm_mode: bool = False, rev: bool = False,
                    use_scan: bool = True
                    ) -> Tuple[List[SegmentPair], int]:
    """Oracle of one SeedAndFilter call. Returns (hsps, num_hits).

    window=(ref_start, ref_end) enables the repeat-masker in-window filter
    (repeat_masker_src/seed_filter.cu:239-244); rm_mode selects the RM dedup
    chain and the minus-strand coordinate remap (rev + len(ref) block length).
    use_scan selects the vectorized scan-form extender (default; equivalent
    to the literal tile-32 loop, see tests/test_extension_oracle.py).
    """
    if use_scan:
        from .scan_spec import extend_hit_scan as _extend
    else:
        _extend = extend_hit_tile32
    if not seed_offsets:
        return [], 0
    kmers = np.array([k for k, _ in seed_offsets], dtype=np.int64)
    qpos = np.array([p for _, p in seed_offsets], dtype=np.int64)
    ends = index_table[kmers].astype(np.int64)
    starts = np.where(kmers > 0, index_table[kmers - 1], 0).astype(np.int64)
    counts = ends - starts
    cum = np.cumsum(counts)
    num_hits = int(cum[-1])

    out: List[SegmentPair] = []
    for (s0, s1, h0, h1) in plan_hit_batches(cum, max_hits):
        if h1 - h0 <= 0:
            continue  # deviation 3: skip empty batches
        batch: List[SegmentPair] = []
        for si in range(s0, s1 + 1):
            for bi in range(starts[si], ends[si]):
                ref_loc = int(pos_table[bi]) + seed_size
                query_loc = int(qpos[si]) + seed_size
                if window is not None and not (window[0] <= ref_loc <= window[1]):
                    continue
                ok, rs, qs, ln, sc = _extend(
                    ref, query, ref_loc, query_loc, sub, xdrop, hspthresh,
                    noentropy)
                if ok:
                    if rm_mode and rev:
                        # compress_output remap
                        # (repeat_masker_src/seed_filter.cu:705-709)
                        qs = len(ref) - 1 - (qs + ln)
                    batch.append(SegmentPair(rs, qs, ln, sc))
        if rm_mode:
            out.extend(dedup_batch_rm(batch))
        else:
            out.extend(dedup_batch(batch))
    return out, num_hits


# ---------------------------------------------------------------------------
# Repeat-masker dedup (repeat_masker_src/seed_filter.cu:47-135,819-831)

def rm_comp_key(h: SegmentPair):
    """RM hspComp: query_start asc, len DESC, ref_start asc, score desc."""
    return (h.query_start, -h.len, h.ref_start, -h.score)


def rm_diag_comp_key(h: SegmentPair):
    """RM hspDiagComp: diagonal, ref_start, query_start asc, score desc."""
    return (_diag(h), h.ref_start, h.query_start, -h.score)


def rm_final_comp_key(h: SegmentPair):
    """RM hspFinalComp: query_start asc, score desc, ref_start DESC."""
    return (h.query_start, -h.score, -h.ref_start)


def rm_exact_equal(x: SegmentPair, y: SegmentPair) -> bool:
    return x.astuple() == y.astuple()


def dedup_batch_rm(hsps: List[SegmentPair]) -> List[SegmentPair]:
    s = sorted(hsps, key=rm_comp_key)
    u = unique_chain(s, rm_exact_equal)
    s2 = sorted(u, key=rm_diag_comp_key)
    u2 = unique_chain(s2, hsp_equal)
    return sorted(u2, key=rm_final_comp_key)
