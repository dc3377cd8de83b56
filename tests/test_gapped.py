"""Native gapped ydrop extension: DP correctness vs a full-matrix oracle,
plus edit-script self-consistency."""

import numpy as np
import pytest

from segalign_tpu.native import gapped_extend_native, get_lib
from segalign_tpu.output.scoring import default_gapped_matrix

O, E = 400, 30
NEG = -10**12


def full_dp_best(ref, query, sub):
    """Unbanded affine-gap forward DP from (0,0); returns the best
    M-cell score (alignment must end in a substitution), over all cells."""
    R, Q = len(ref), len(query)
    M = np.full((Q + 1, R + 1), NEG, dtype=np.int64)
    I = np.full((Q + 1, R + 1), NEG, dtype=np.int64)
    D = np.full((Q + 1, R + 1), NEG, dtype=np.int64)
    M[0, 0] = 0
    for j in range(1, R + 1):
        D[0, j] = max(M[0, j - 1] - O, D[0, j - 1]) - E
    for i in range(1, Q + 1):
        I[i, 0] = max(M[i - 1, 0] - O, I[i - 1, 0]) - E
        for j in range(1, R + 1):
            b = max(M[i - 1, j - 1], I[i - 1, j - 1], D[i - 1, j - 1])
            if b > NEG // 2:
                M[i, j] = b + sub[ref[j - 1], query[i - 1]]
            I[i, j] = max(M[i - 1, j] - O, I[i - 1, j]) - E
            D[i, j] = max(M[i, j - 1] - O, D[i, j - 1]) - E
    best = int(M.max())
    return max(best, 0)


def score_script(ref, query, sub, r0, q0, ops):
    s = 0
    i, j = q0, r0
    gaps = 0
    prev = None
    for op in ops.decode():
        if op == "M":
            s += int(sub[ref[j], query[i]])
            i += 1
            j += 1
        elif op == "I":
            s -= E + (O if prev != "I" else 0)
            i += 1
        else:
            s -= E + (O if prev != "D" else 0)
            j += 1
        prev = op
    return s, j, i


@pytest.fixture(scope="module")
def sub():
    assert get_lib() is not None
    return default_gapped_matrix()


def enc(s):
    lut = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    return np.array([lut.get(c, 5) for c in s], dtype=np.uint8)


def test_perfect_match(sub):
    seq = enc("ACGTACGTACGTACGTACGT")
    r = gapped_extend_native(seq, seq, sub, O, E, 9430, 10, 10)
    score, rs, qs, re_, qe = r[:5]
    # extends to both ends: 20 matches
    assert (rs, qs, re_, qe) == (0, 0, 20, 20)
    assert score == int(sub[seq, seq].sum())


def test_gap_jump(sub):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 200).astype(np.uint8)
    # query = ref with 7 bases deleted at position 120
    q = np.concatenate([a[:120], a[127:]])
    r = gapped_extend_native(a, q, sub, O, E, 9430, 50, 50)
    score, rs, qs, re_, qe = r[:5]
    ops = r[5]
    assert rs == 0 and qs == 0
    assert re_ == 200 and qe == 193
    assert ops.count(b"D"[0]) == 7 and ops.count(b"I"[0]) == 0
    got, jend, iend = score_script(a, q, sub, rs, qs, ops)
    assert got == score
    assert (jend, iend) == (re_, qe)


@pytest.mark.parametrize("seed", range(6))
def test_vs_full_dp(sub, seed):
    rng = np.random.default_rng(seed)
    n = 60
    ref = rng.integers(0, 4, n).astype(np.uint8)
    # diverged copy with small indels
    q = list(ref)
    for _ in range(4):
        p = int(rng.integers(1, len(q) - 1))
        if rng.random() < 0.5:
            q.insert(p, int(rng.integers(0, 4)))
        else:
            del q[p]
    for _ in range(5):
        p = int(rng.integers(0, len(q)))
        q[p] = int(rng.integers(0, 4))
    query = np.array(q, dtype=np.uint8)

    # right-extension from (0,0) only: oracle = full DP
    want = full_dp_best(ref, query, sub)
    r = gapped_extend_native(ref, query, sub, O, E, 10**9, 0, 0)
    score, rs, qs, re_, qe, ops = r
    # left extension from (0,0) is empty, so score == right score
    assert score == want, (seed, score, want)
    got, jend, iend = score_script(ref, query, sub, rs, qs, ops)
    assert got == score
    assert (jend, iend) == (re_, qe)


def test_wall_blocks_extension(sub):
    seq = enc("ACGTACGTAC")
    wall = np.concatenate([seq, [6], seq]).astype(np.uint8)
    r = gapped_extend_native(wall, wall, sub, O, E, 9430, 2, 2)
    score, rs, qs, re_, qe, ops = r
    assert re_ <= 10 and rs >= 0  # never crosses the '&' wall
