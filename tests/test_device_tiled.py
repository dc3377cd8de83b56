"""Tiled-engine dispatch parity: DeviceAligner with the tiled first-window
engine (planned hit order + orig-keyed compaction) must produce EXACTLY
the row-order engine's HSPs for whole chunks, including logical-batch
(max_hits) boundaries and the RM window mask."""

import numpy as np
import pytest

from segalign_tpu.config import make_seed_config, build_substitution_matrix
from segalign_tpu.io.encode import revcomp_codes
from segalign_tpu.pipeline.device import DeviceAligner


def _mk(monkeypatch, tiled: bool, **kw):
    if tiled:
        monkeypatch.setenv("SEGALIGN_PALLAS", "1")   # pallas_interpret off-TPU
        monkeypatch.setenv("SEGALIGN_TILED", "1")
        monkeypatch.setenv("SEGALIGN_TILED_MIN", "1")
        monkeypatch.setenv("SEGALIGN_QBUCKET", "4096")
    else:
        monkeypatch.setenv("SEGALIGN_PALLAS", "0")
        monkeypatch.setenv("SEGALIGN_TILED", "0")
    sc = make_seed_config("12of19")
    sub = build_substitution_matrix(910)
    return DeviceAligner(
        shape_pos=sc.shape_pos, seed_size=sc.size, transition=sc.transition,
        step=1, sub_mat=sub, xdrop=910, hspthresh=1500, noentropy=False,
        chunk_size=1024, HBUF=4096, B=256, W=128, **kw)


@pytest.mark.parametrize("rm", [False, True])
def test_tiled_dispatch_matches_rows(monkeypatch, rm):
    rng = np.random.default_rng(11)
    n = 4000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 900).astype(np.uint8)
    ref[600:1500] = core
    mut = rng.random(900) < 0.07
    query[2000:2900] = np.where(mut, (core + 1) % 4, core).astype(np.uint8)
    qrc = revcomp_codes(query)

    kw = dict(rm_mode=rm)
    a = _mk(monkeypatch, tiled=False, **kw)
    a.set_ref(ref)
    a.set_query(query, qrc)
    b = _mk(monkeypatch, tiled=True, **kw)
    b.set_ref(ref)
    b.set_query(query, qrc)
    assert b.tiled and b.engine == "pallas_interpret"

    window = (500, 2600) if rm else None
    total = 0
    for rev in (False, True):
        for cs in range(0, n - 19, 1024):
            ce = min(cs + 1024, n - 19)
            ra = a.seed_and_filter(cs, ce, rev, window=window)
            rb = b.seed_and_filter(cs, ce, rev, window=window)
            assert ra.num_hits == rb.num_hits
            assert ra.num_seeds == rb.num_seeds
            np.testing.assert_array_equal(
                ra.hsps, rb.hsps, err_msg=f"cs={cs} rev={rev} rm={rm}")
            total += len(ra.hsps)
    assert total > 0


def test_tiled_batch_boundaries(monkeypatch):
    """Small max_hits forces several logical batches; per-batch dedup
    boundaries must survive the planned (re-ordered) extension."""
    rng = np.random.default_rng(5)
    n = 3000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = ref.copy()  # dense self-hits
    qrc = revcomp_codes(query)
    a = _mk(monkeypatch, tiled=False, max_hits=500)
    a.set_ref(ref)
    a.set_query(query, qrc)
    b = _mk(monkeypatch, tiled=True, max_hits=500)
    b.set_ref(ref)
    b.set_query(query, qrc)
    ra = a.seed_and_filter(0, 1024, False)
    rb = b.seed_and_filter(0, 1024, False)
    assert ra.num_hits == rb.num_hits and ra.num_hits > 1000
    np.testing.assert_array_equal(ra.hsps, rb.hsps)
    assert len(ra.hsps) > 0
