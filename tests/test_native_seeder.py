"""Native (C++) chunk seeder vs the NumPy/device-path semantics.

The native seeder must reproduce, bit-for-bit:
  - the seed slot enumeration of ops/seeding.chunk_seeds (position-major,
    base kmer then transition variants)
  - per-slot hit counts from the index table
  - hit emission order (slot order, bucket order within a slot) with the
    +seed_size offsets of ops/hits.expand_hits
  - the iteration-batch chain of pipeline/device.py::_plan_limits
"""

import numpy as np
import pytest

from segalign_tpu.config import make_seed_config
from segalign_tpu.constants import TRANSITION_MASK
from segalign_tpu.index.seed_table import build_seed_table
from segalign_tpu.native import ChunkSeeder, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def numpy_reference(query, chunk_start, chunk_len, index_table, pos_table,
                    shape_pos, seed_size, transition):
    """Literal restatement of chunk_seeds + expand_hits in numpy."""
    k = len(shape_pos)
    nvar = 1 + k if transition else 1
    qlen = len(query)
    ref_loc, query_loc = [], []
    counts = []
    num_seeds = 0
    for j in range(chunk_len):
        p = chunk_start + j
        window = query[p:p + seed_size]
        valid = len(window) == seed_size and bool((window < 4).all())
        base = 0
        if valid:
            for i, sp in enumerate(shape_pos):
                base |= (int(query[p + sp]) & 3) << (2 * (k - 1 - i))
            num_seeds += nvar
        for v in range(nvar):
            if not valid:
                counts.append(0)
                continue
            km = base if v == 0 else base ^ (TRANSITION_MASK << (2 * (v - 1)))
            end = int(index_table[km])
            start = int(index_table[km - 1]) if km > 0 else 0
            counts.append(end - start)
            for b in range(start, end):
                ref_loc.append(int(pos_table[b]) + seed_size)
                query_loc.append(p + seed_size)
    return (np.array(ref_loc, np.int32), np.array(query_loc, np.int32),
            np.array(counts, np.int64), num_seeds)


def plan_limits_reference(cum, num_hits, max_hits):
    """pipeline/device.py::_plan_limits + boundary assembly, in numpy."""
    S = len(cum)
    if num_hits < max_hits:
        num_iter = 2
    else:
        num_iter = num_hits // max_hits + 2
    poss, vals = [], []
    limit = min(num_hits, max_hits)
    for _ in range(num_iter - 1):
        pos = int(np.searchsorted(cum, limit, side="left")) - 1
        val = int(cum[pos]) if pos >= 0 else 0
        poss.append(pos)
        vals.append(val)
        limit = min(val + max_hits, num_hits)
    limit_pos = poss + [S - 1]
    hit_bound = vals + [num_hits]
    if num_iter >= 2 and limit_pos[-1] == limit_pos[-2]:
        limit_pos.pop()
        hit_bound.pop()
    return np.array(limit_pos, np.int64), np.array(hit_bound, np.int64)


@pytest.mark.parametrize("transition", [False, True])
@pytest.mark.parametrize("pattern", ["12of19", "111010011011"])
def test_native_seeder_matches_numpy(transition, pattern):
    rng = np.random.default_rng(7)
    sc = make_seed_config(pattern)
    ref = rng.integers(0, 4, 5000).astype(np.uint8)
    # plant shared content so hits exist
    query = rng.integers(0, 6, 3000).astype(np.uint8)
    query[500:1500] = ref[1000:2000]
    index_table, pos_table = build_seed_table(
        ref, 1, sc.shape_pos, sc.size, len(sc.shape_pos))

    chunk_start, chunk_len = 400, 1200
    want_rl, want_ql, want_cnt, want_seeds = numpy_reference(
        query, chunk_start, chunk_len, index_table, pos_table,
        sc.shape_pos, sc.size, transition)

    seeder = ChunkSeeder(chunk_len, len(sc.shape_pos), transition)
    out = seeder.seed(query, chunk_start, chunk_len, index_table, pos_table,
                      sc.shape_pos, sc.size, max_hits=1 << 30)
    assert out is not None
    rl, ql, limit_pos, hit_bound, num_seeds, num_hits = out
    assert num_seeds == want_seeds
    assert num_hits == len(want_rl)
    np.testing.assert_array_equal(rl, want_rl)
    np.testing.assert_array_equal(ql, want_ql)

    # exact per-slot counts drive the batch plan; check plan for several
    # max_hits values incl. tiny ones that split many batches
    cum = np.cumsum(want_cnt)
    for max_hits in (7, 64, 1000, 1 << 30):
        out = seeder.seed(query, chunk_start, chunk_len, index_table,
                          pos_table, sc.shape_pos, sc.size,
                          max_hits=max_hits)
        _, _, lp, hb, _, _ = out
        want_lp, want_hb = plan_limits_reference(cum, num_hits, max_hits)
        np.testing.assert_array_equal(lp, want_lp)
        np.testing.assert_array_equal(hb, want_hb)


def test_edge_no_hits_and_bounds():
    sc = make_seed_config("12of19")
    ref = np.zeros(100, np.uint8)  # all-A ref, tiny
    index_table, pos_table = build_seed_table(
        ref, 1, sc.shape_pos, sc.size, len(sc.shape_pos))
    query = np.full(200, 5, np.uint8)  # all N: no valid seeds
    seeder = ChunkSeeder(150, len(sc.shape_pos), True)
    out = seeder.seed(query, 0, 150, index_table, pos_table, sc.shape_pos,
                      sc.size, max_hits=100)
    rl, ql, lp, hb, num_seeds, num_hits = out
    assert num_seeds == 0 and num_hits == 0 and len(rl) == 0

    # chunk running off the end of the query: windows truncated -> invalid
    query2 = np.zeros(50, np.uint8)
    out = seeder.seed(query2, 0, 50, index_table, pos_table, sc.shape_pos,
                      sc.size, max_hits=100)
    rl, ql, lp, hb, num_seeds, num_hits = out
    want_valid = 50 - sc.size + 1  # positions with a full window
    assert num_seeds == want_valid * (1 + len(sc.shape_pos))
