import numpy as np

from segalign_tpu.config import make_seed_config
from segalign_tpu.constants import INVALID_KMER
from segalign_tpu.oracle.reference import (
    generate_seed_pos_table, kmers_at, extract_seed_offsets,
    plan_hit_batches)


def brute_kmer(codes, pos, shape_pos, seed_size):
    if pos + seed_size > len(codes):
        return INVALID_KMER
    window = codes[pos:pos + seed_size]
    if (window >= 4).any():
        return INVALID_KMER
    k = 0
    for p in shape_pos:
        k = (k << 2) | int(window[p])
    return k


def test_kmers_at_matches_brute():
    rng = np.random.default_rng(0)
    sc = make_seed_config("12of19")
    codes = rng.integers(0, 8, size=300).astype(np.uint8)
    positions = np.arange(0, 300)
    got = kmers_at(codes, positions, sc.shape_pos, sc.size)
    for p in positions:
        assert got[p] == brute_kmer(codes, p, sc.shape_pos, sc.size), p


def test_seed_pos_table_step1():
    rng = np.random.default_rng(1)
    sc = make_seed_config("12of19")
    codes = rng.integers(0, 4, size=500).astype(np.uint8)
    index_table, pos_table = generate_seed_pos_table(
        codes, 1, sc.shape_pos, sc.size, sc.kmer_size)
    # positions 1 .. len-19 (position 0 never indexed: reference quirk)
    assert len(pos_table) == 500 - 19
    assert pos_table.min() == 1
    assert pos_table.max() == 500 - 19
    assert index_table[-1] == len(pos_table)
    # bucket contents correct
    for p in [1, 5, 250, 481]:
        k = brute_kmer(codes, p, sc.shape_pos, sc.size)
        lo = index_table[k - 1] if k > 0 else 0
        hi = index_table[k]
        assert p in pos_table[lo:hi]


def test_seed_pos_table_step3():
    sc = make_seed_config("12of19")
    codes = np.zeros(100, dtype=np.uint8)
    index_table, pos_table = generate_seed_pos_table(
        codes, 3, sc.shape_pos, sc.size, sc.kmer_size)
    # offset=(19+1)%3=2, start=1, num_steps=(100-19+2)//3=27
    assert list(pos_table) == [1 + 3 * i for i in range(27)]


def test_extract_seed_offsets_transitions():
    sc = make_seed_config("12of19")
    codes = np.zeros(40, dtype=np.uint8)  # all A
    out = extract_seed_offsets(codes, 0, 0, 2, sc.size, sc.shape_pos, True)
    # per position: 1 base + 12 transition variants
    assert len(out) == 2 * 13
    base = out[0]
    assert base == (0, 0)
    # variants flip one 2-bit field with 0b10
    variants = {k for k, _ in out[1:13]}
    assert variants == {2 << (2 * t) for t in range(12)}
    assert all(p == 1 for _, p in out[13:])


def test_extract_seed_offsets_invalid_skipped():
    sc = make_seed_config("12of19")
    codes = np.zeros(50, dtype=np.uint8)
    codes[25] = 5  # N kills windows covering it
    out = extract_seed_offsets(codes, 0, 0, 31, sc.size, sc.shape_pos, False)
    positions = [p for _, p in out]
    assert positions == [p for p in range(31) if not (p <= 25 < p + 19)]


def test_plan_hit_batches_small():
    cum = np.cumsum([3, 0, 5, 2])
    batches = plan_hit_batches(cum, max_hits=100)
    # Reference quirk (seed_filter.cu:721-743): even when everything fits,
    # num_iter=2 and lower_bound(num_hits)-1 lands one seed early, so the
    # LAST nonzero-hit seed always forms its own dedup batch.
    assert batches == [(0, 2, 0, 8), (3, 3, 8, 10)]


def test_plan_hit_batches_trailing_zero_seeds():
    cum = np.cumsum([3, 0, 5, 2, 0, 0])
    batches = plan_hit_batches(cum, max_hits=100)
    assert batches == [(0, 2, 0, 8), (3, 5, 8, 10)]


def test_plan_hit_batches_split():
    cum = np.cumsum([30, 30, 30, 30])
    batches = plan_hit_batches(cum, max_hits=50)
    # limits: lower_bound(50)->seed1 (cum 60) minus 1 => seed0;
    # next limit 30+50=80 -> lower_bound -> seed2(90)-1=seed1; etc.
    assert batches[0] == (0, 0, 0, 30)
    assert batches[1] == (1, 1, 30, 60)
    total = sum(b[3] - b[2] for b in batches)
    assert total == 120
    assert batches[-1][1] == 3


def test_native_table_build_matches_numpy():
    """Native threaded build (seeder.cpp) vs the numpy reference, including
    N-rejection, step > 1, and edge windows."""
    import numpy as np
    from segalign_tpu.index.seed_table import build_seed_table
    from segalign_tpu.native import build_seed_table_fast
    from segalign_tpu.config import make_seed_config

    if build_seed_table_fast([0], 1, [0, 1, 2, 3], 4, 4) is None:
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(5)
    for step in (1, 2, 3):
        for shape in ("12of19",):
            sc = make_seed_config(shape)
            ref = rng.integers(0, 4, 50_000).astype(np.uint8)
            ref[100:140] = 4   # soft-masked
            ref[9000:9007] = 5  # N
            it_np, pt_np = build_seed_table(
                ref, step, sc.shape_pos, sc.size, sc.kmer_size,
                use_native=False)
            it_nat, pt_nat = build_seed_table_fast(
                ref, step, sc.shape_pos, sc.size, sc.kmer_size)
            np.testing.assert_array_equal(it_np, it_nat, err_msg=f"{step} {shape}")
            np.testing.assert_array_equal(pt_np, pt_nat, err_msg=f"{step} {shape}")
