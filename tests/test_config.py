import numpy as np

from segalign_tpu.config import (
    resolve_seed_shape, make_seed_config, build_substitution_matrix, Config)
from segalign_tpu.constants import A_NT, C_NT, G_NT, T_NT, L_NT, N_NT, X_NT, E_NT


def test_seed_shape_12of19():
    shape, size = resolve_seed_shape("12of19")
    assert shape == "TTT0T00TT00T0T0TTTT"
    assert size == 19
    sc = make_seed_config("12of19")
    assert sc.kmer_size == 12
    assert sc.shape_pos == (0, 1, 2, 4, 7, 8, 11, 13, 15, 16, 17, 18)
    assert sc.transition


def test_seed_shape_14of22():
    shape, size = resolve_seed_shape("14of22")
    assert shape == "TTT0T0TT00TT00T0T0TTTT"
    assert size == 22
    assert make_seed_config("14of22").kmer_size == 14


def test_seed_shape_arbitrary_pattern_T_becomes_dont_care():
    # reference quirk: only '1' survives as a sampled column
    shape, size = resolve_seed_shape("1T01")
    assert shape == "T00T"
    assert size == 4


def test_sub_mat_default():
    sub = build_substitution_matrix(910)
    assert sub[A_NT, A_NT] == 91
    assert sub[C_NT, C_NT] == 100
    assert sub[A_NT, T_NT] == -123
    assert sub[G_NT, C_NT] == -125
    assert sub[A_NT, L_NT] == -1000
    assert sub[N_NT, N_NT] == -1000
    assert sub[A_NT, X_NT] == -100
    assert sub[X_NT, X_NT] == -100
    assert sub[N_NT, X_NT] == -1000
    assert (sub[:, E_NT] == -9100).all()
    assert (sub[E_NT, :] == -9100).all()


def test_sub_mat_ambiguous_n():
    sub = build_substitution_matrix(910, "n")
    assert sub[N_NT, N_NT] == 0
    assert sub[A_NT, N_NT] == 0
    assert sub[A_NT, X_NT] == -100   # X unchanged for plain "n"


def test_sub_mat_ambiguous_reward_penalty():
    sub = build_substitution_matrix(910, "n,3,7")
    assert sub[N_NT, N_NT] == 3
    assert sub[A_NT, N_NT] == -7


def test_sub_mat_iupac():
    sub = build_substitution_matrix(910, "iupac")
    assert sub[X_NT, X_NT] == 0
    assert sub[A_NT, X_NT] == 0


def test_config_defaults():
    cfg = Config()
    assert cfg.gappedthresh == 3000
    assert cfg.seed.transition
    assert cfg.sub_mat.shape == (8, 8)
