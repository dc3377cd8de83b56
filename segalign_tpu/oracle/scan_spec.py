"""Sequential-scan specification of the x-drop extension.

The reference's warp/tile-32 algorithm (src/seed_filter.cu:302-604) is
semantically equivalent to a plain left-to-right scan; this module states
that scan form in NumPy. The equivalence (property-tested against
extend_hit_tile32 in tests/test_extension_oracle.py) is what lets the TPU
kernels use 128/512-wide tiles while reproducing reference output exactly:

  Walk positions p = 0, 1, 2, ...:
    cum_p   = cum_{p-1} + sub[ref[loc+p], query[loc+p]]   (0 when out of bounds)
    (m_p, pos_p) = (cum_p, p) if cum_p > m_{p-1} else (m_{p-1}, pos_{p-1})
    stop at the FIRST p with (m_p - cum_p) > xdrop; the result is
    (m_{p-1}, pos_{p-1}) — the running max strictly before the drop position.
    If no drop, stop at the sequence edge with (m, pos) over all in-bounds
    positions.

  The max is tie-broken to the EARLIEST position (strict > for improvement).
  Entropy counts: matches (equal codes < 4) at positions <= the final max
  position, in each direction (left scan counts positions 1..left_pos back
  from the anchor).
"""

from __future__ import annotations

import numpy as np


def _scan_direction(scores: np.ndarray, xdrop: int):
    """Given the per-position score array for one direction (index 0 = first
    extension position), return (max_score, max_pos, stop_pos) where
    positions are 1-based counts of included positions: max_pos = number of
    positions in the maximal extent (0 = none).

    Internally positions here are 0-based; the caller maps to the
    reference's conventions (right: pos 0 = anchor; left: pos 1 = first
    char before anchor)."""
    if len(scores) == 0:
        return 0, -1, 0
    cum = np.cumsum(scores)
    m = np.maximum(np.maximum.accumulate(cum), 0)
    drop = (m - cum) > xdrop
    ph = int(np.argmax(drop)) if drop.any() else len(scores)
    if ph == 0:
        return 0, -1, 0
    pre = cum[:ph]
    best = int(pre.max())
    if best <= 0:
        return 0, -1, ph
    return best, int(np.argmax(pre)), ph


def extend_hit_scan(ref: np.ndarray, query: np.ndarray, ref_loc: int,
                    query_loc: int, sub: np.ndarray, xdrop: int,
                    hspthresh: int, noentropy: bool):
    """Scan-form equivalent of oracle.reference.extend_hit_tile32."""
    ref_len = len(ref)
    query_len = len(query)

    # ---- right: positions p = 0.. map to (ref_loc+p, query_loc+p)
    lim_r = max(0, min(ref_len - ref_loc, query_len - query_loc))
    r_sl = ref[ref_loc:ref_loc + lim_r]
    q_sl = query[query_loc:query_loc + lim_r]
    sc_r = sub[r_sl, q_sl].astype(np.int64)
    m_r, p_r, stop_r = _scan_direction(sc_r, xdrop)
    # right extent in reference convention: max_pos (0-based position index),
    # -1 -> prev_max_pos initial value of -1 is reported as extent 0 in the
    # tile algorithm only via max_pos; replicate: extent = p_r if any else -1
    right_pos = p_r if p_r >= 0 else -1

    # ---- left: positions p = 1.. map to (ref_loc-p, query_loc-p)
    lim_l = max(0, min(ref_loc, query_loc))
    r_sl = ref[ref_loc - lim_l:ref_loc][::-1]
    q_sl = query[query_loc - lim_l:query_loc][::-1]
    sc_l = sub[r_sl, q_sl].astype(np.int64)
    m_l, p_l, stop_l = _scan_direction(sc_l, xdrop)
    left_pos = (p_l + 1) if p_l >= 0 else 0  # reference left positions are 1-based

    total = m_r + m_l
    extent = (right_pos if right_pos >= 0 else 0) + left_pos
    # NOTE: when right_pos == -1 the tile algorithm's extent contribution is
    # max_pos == -1, i.e. extent = left_pos - 1; replicate exactly:
    extent = right_pos + left_pos

    # ---- entropy counts: matches at in-extent positions
    counts = np.zeros(4, dtype=np.int64)
    if right_pos >= 0:
        rr = ref[ref_loc:ref_loc + right_pos + 1]
        qq = query[query_loc:query_loc + right_pos + 1]
        mask = (rr == qq) & (rr < 4)
        for c in range(4):
            counts[c] += int(np.sum(mask & (rr == c)))
    if left_pos > 0:
        rr = ref[ref_loc - left_pos:ref_loc]
        qq = query[query_loc - left_pos:query_loc]
        mask = (rr == qq) & (rr < 4)
        for c in range(4):
            counts[c] += int(np.sum(mask & (rr == c)))

    entropy = 1.0
    if hspthresh <= total <= 3 * hspthresh and not noentropy:
        if int(counts.sum()) >= 20:
            ext1 = float(extent + 1)
            e = 0.0
            for c in range(4):
                if counts[c] != 0:
                    e += (counts[c] / ext1) * np.log(counts[c] / ext1)
            entropy = -e / np.log(4.0)

    adjusted = int(np.float32(total) * entropy)
    if adjusted >= hspthresh:
        score = total
        if entropy > 0:
            score = int(total * entropy)
        return True, ref_loc - left_pos, query_loc - left_pos, extent, score
    return False, ref_loc, query_loc, 0, 0
