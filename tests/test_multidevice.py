"""Multi-device chunk farming must reproduce single-device results exactly.

Runs on the virtual 8-device CPU platform."""

import numpy as np
import jax

from segalign_tpu.config import make_seed_config, build_substitution_matrix
from segalign_tpu.parallel.multi import MultiDeviceAligner, ChunkWork


def test_multi_device_matches_single():
    cpus = jax.devices("cpu")
    assert len(cpus) >= 4, "conftest should provide 8 virtual CPU devices"

    rng = np.random.default_rng(77)
    sc = make_seed_config("12of19")
    sub = build_substitution_matrix(910)
    n = 4000
    ref = rng.integers(0, 4, n).astype(np.uint8)
    query = rng.integers(0, 4, n).astype(np.uint8)
    core = rng.integers(0, 4, 600).astype(np.uint8)
    ref[500:1100] = core
    query[2000:2600] = core
    qrc = np.array([3, 2, 1, 0, 4, 5, 6, 7], np.uint8)[query[::-1]]

    kw = dict(shape_pos=sc.shape_pos, seed_size=sc.size, transition=True,
              step=1, sub_mat=sub, xdrop=910, hspthresh=1500,
              noentropy=False, chunk_size=512, HBUF=1024, B=256)

    single = MultiDeviceAligner(devices=cpus[:1], **kw)
    multi = MultiDeviceAligner(devices=cpus[:4], **kw)
    for a in (single, multi):
        a.set_ref(ref)
        a.set_query(query, qrc)

    q_len = n - sc.size
    work = []
    for cs in range(0, q_len, 512):
        ce = min(cs + 512, q_len)
        work.append(ChunkWork(cs, ce, False))
        work.append(ChunkWork(cs, ce, True))

    res1 = single.map_chunks(work)
    res4 = multi.map_chunks(work)
    assert len(res1) == len(res4)
    total = 0
    for a, b in zip(res1, res4):
        assert a.num_hits == b.num_hits
        assert a.num_seeds == b.num_seeds
        np.testing.assert_array_equal(a.hsps, b.hsps)
        total += len(a.hsps)
    assert total > 0
