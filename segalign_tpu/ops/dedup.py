"""HSP dedup: thrust sort/unique chains on the host.

Replicates the pairwise dedup (/root/reference/src/seed_filter.cu:769-782)
and the repeat-masker 4-stage dedup
(/root/reference/repeat_masker_src/seed_filter.cu:819-831) exactly, including
thrust::unique_copy's compare-against-last-KEPT chain semantics.

Sorts are vectorized numpy lexsorts; the containment chain is a sequential
scan per sorted run (a C++ native version is planned for large batches).
"""

from __future__ import annotations

import numpy as np

U32 = np.uint64(1) << np.uint64(32)


def _diag_u32(rs, qs):
    # uint32 wraparound of ref_start - query_start, compared unsigned
    return (rs.astype(np.int64) - qs.astype(np.int64)) % (1 << 32)


def _containment_chain(diag, rs, end, rs_key_same_group):
    """thrust::unique_copy with the same-diagonal containment predicate
    (src/seed_filter.cu:47-52) over already-sorted arrays.

    Elements are sorted by (diag asc, rs asc, ...). Predicate between sorted
    x (kept) and later y: same diag AND (end_y <= end_x OR rs_y == rs_x).
    Returns kept mask."""
    n = len(diag)
    kept = np.zeros(n, dtype=bool)
    last = -1
    for i in range(n):
        if last < 0 or diag[i] != diag[last]:
            kept[i] = True
            last = i
            continue
        if rs[i] == rs[last] or end[i] <= end[last]:
            continue
        kept[i] = True
        last = i
    return kept


def dedup_pairwise(rs, qs, ln, sc, use_native: bool = True):
    """Pairwise-mode dedup of one hit batch. Inputs/outputs int64 arrays;
    returns (rs, qs, ln, sc) in final LASTZ output order."""
    rs = np.asarray(rs, np.int64)
    qs = np.asarray(qs, np.int64)
    ln = np.asarray(ln, np.int64)
    sc = np.asarray(sc, np.int64)
    if len(rs) == 0:
        return rs, qs, ln, sc
    if use_native:
        from ..native import dedup_pairwise_native
        r = dedup_pairwise_native(rs, qs, ln, sc)
        if r is not None:
            return r
    diag = _diag_u32(rs, qs)
    # hspComp: diag, ref_start, len asc; score desc (stable)
    order = np.lexsort((-sc, ln, rs, diag))
    diag_s, rs_s, qs_s, ln_s, sc_s = (a[order] for a in (diag, rs, qs, ln, sc))
    end_s = rs_s + ln_s
    kept = _containment_chain(diag_s, rs_s, end_s, None)
    rs2, qs2, ln2, sc2 = rs_s[kept], qs_s[kept], ln_s[kept], sc_s[kept]
    # hspCompLastz: query_start, ref_start, len asc; score desc
    order2 = np.lexsort((-sc2, ln2, rs2, qs2))
    return rs2[order2], qs2[order2], ln2[order2], sc2[order2]


def dedup_rm(rs, qs, ln, sc, use_native: bool = True):
    """Repeat-masker-mode dedup of one hit batch
    (repeat_masker_src/seed_filter.cu:819-831):
      sort hspComp(qs, len desc, rs, score desc) -> unique(exact equality)
      -> sort hspDiagComp(diag, rs, qs, score desc) -> unique(containment)
      -> sort hspFinalComp(qs asc, score desc, rs desc)."""
    rs = np.asarray(rs, np.int64)
    qs = np.asarray(qs, np.int64)
    ln = np.asarray(ln, np.int64)
    sc = np.asarray(sc, np.int64)
    if len(rs) == 0:
        return rs, qs, ln, sc
    if use_native:
        from ..native import dedup_rm_native
        r = dedup_rm_native(rs, qs, ln, sc)
        if r is not None:
            return r

    order = np.lexsort((-sc, rs, -ln, qs))
    rs_s, qs_s, ln_s, sc_s = (a[order] for a in (rs, qs, ln, sc))
    # exact-equality unique: identical tuples are adjacent after a full sort
    same = np.zeros(len(rs_s), dtype=bool)
    if len(rs_s) > 1:
        same[1:] = ((rs_s[1:] == rs_s[:-1]) & (qs_s[1:] == qs_s[:-1]) &
                    (ln_s[1:] == ln_s[:-1]) & (sc_s[1:] == sc_s[:-1]))
    rs_s, qs_s, ln_s, sc_s = (a[~same] for a in (rs_s, qs_s, ln_s, sc_s))

    diag = _diag_u32(rs_s, qs_s)
    order2 = np.lexsort((-sc_s, qs_s, rs_s, diag))
    diag2, rs2, qs2, ln2, sc2 = (a[order2]
                                 for a in (diag, rs_s, qs_s, ln_s, sc_s))
    kept = _containment_chain(diag2, rs2, rs2 + ln2, None)
    rs3, qs3, ln3, sc3 = rs2[kept], qs2[kept], ln2[kept], sc2[kept]

    order3 = np.lexsort((-rs3, -sc3, qs3))
    return rs3[order3], qs3[order3], ln3[order3], sc3[order3]
