"""Triangulated dedup tests: oracle (literal predicate chain) vs numpy
implementation vs native C++."""

import numpy as np
import pytest

from segalign_tpu.oracle.reference import (
    SegmentPair, dedup_batch, dedup_batch_rm)
from segalign_tpu.ops.dedup import dedup_pairwise, dedup_rm
from segalign_tpu.native import get_lib


def random_hsps(rng, n, coord=2000):
    """Batches rich in same-diagonal containments and duplicates."""
    rs = rng.integers(0, coord, n)
    qs = rng.integers(0, coord, n)
    ln = rng.integers(1, 200, n)
    sc = rng.integers(1500, 9000, n)
    # force same-diagonal nests and exact duplicates
    for i in range(0, n - 3, 4):
        d = int(rs[i]) - int(qs[i])
        rs[i + 1] = rs[i] + 10
        qs[i + 1] = rs[i + 1] - d       # same diag, nested candidate
        ln[i + 1] = max(1, int(ln[i]) - 20)
        rs[i + 2], qs[i + 2], ln[i + 2], sc[i + 2] = (rs[i], qs[i], ln[i],
                                                      sc[i])  # exact dup
    return (rs.astype(np.int64), qs.astype(np.int64), ln.astype(np.int64),
            sc.astype(np.int64))


def to_arr(hsps):
    return np.array([h.astuple() for h in hsps], np.int64).reshape(-1, 4)


@pytest.mark.parametrize("seed", range(5))
def test_dedup_pairwise_triangulation(seed):
    rng = np.random.default_rng(seed)
    rs, qs, ln, sc = random_hsps(rng, 200)
    want = to_arr(dedup_batch(
        [SegmentPair(*map(int, t)) for t in zip(rs, qs, ln, sc)]))
    got_np = np.stack(dedup_pairwise(rs, qs, ln, sc, use_native=False),
                      axis=1)
    np.testing.assert_array_equal(got_np, want)
    if get_lib() is not None:
        got_cc = np.stack(dedup_pairwise(rs, qs, ln, sc, use_native=True),
                          axis=1)
        np.testing.assert_array_equal(got_cc, want)


@pytest.mark.parametrize("seed", range(5))
def test_dedup_rm_triangulation(seed):
    rng = np.random.default_rng(100 + seed)
    rs, qs, ln, sc = random_hsps(rng, 200)
    want = to_arr(dedup_batch_rm(
        [SegmentPair(*map(int, t)) for t in zip(rs, qs, ln, sc)]))
    got_np = np.stack(dedup_rm(rs, qs, ln, sc, use_native=False), axis=1)
    np.testing.assert_array_equal(got_np, want)
    if get_lib() is not None:
        got_cc = np.stack(dedup_rm(rs, qs, ln, sc, use_native=True), axis=1)
        np.testing.assert_array_equal(got_cc, want)


def test_native_lib_builds():
    assert get_lib() is not None, "native library failed to build"


def test_native_encode_matches_numpy():
    lib = get_lib()
    if lib is None:
        pytest.skip("no native lib")
    import ctypes
    from segalign_tpu.io.encode import encode, revcomp_codes
    data = np.frombuffer(b"ACGTacgtNn&xyz" * 10, dtype=np.uint8).copy()
    out = np.zeros_like(data)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.encode_bytes(data.ctypes.data_as(u8p), out.ctypes.data_as(u8p),
                     len(data))
    np.testing.assert_array_equal(out, encode(bytes(data)))
    rc = np.zeros_like(out)
    lib.revcomp_codes(out.ctypes.data_as(u8p), rc.ctypes.data_as(u8p),
                      len(out))
    np.testing.assert_array_equal(rc, revcomp_codes(out))
