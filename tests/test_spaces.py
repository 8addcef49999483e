"""Space coverage: uint8 integer data (L2SpaceI parity,
hnswlib/space_l2.h:294-323) — uint8 values are exact in bf16, so the inline
fast path computes the same integer distances the reference's scalar int
loop does."""

import numpy as np

from hnsw_tpu.core.spaces import L2Space, get_space
from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.models.hnsw import HNSWIndex


def test_uint8_data_exact_distances(rng):
    x8 = rng.integers(0, 256, size=(500, 32)).astype(np.uint8)
    idx = HNSWIndex("l2", dim=32, m=8, ef_construction=64)
    idx.add_items(x8, np.arange(500))
    q8 = x8[:8]
    d, l = idx.search(q8, k=1, ef=32)
    assert np.all(l[:, 0] == np.arange(8))
    assert np.all(d[:, 0] == 0.0)
    # distances are exact integers
    d5, l5 = idx.search(q8, k=5, ef=64)
    want = ((q8[:, None, :].astype(np.int64) - x8[None, :, :].astype(np.int64)) ** 2).sum(-1)
    for i in range(8):
        for j in range(5):
            if l5[i, j] >= 0:
                assert d5[i, j] == want[i, l5[i, j]], (i, j)


def test_uint8_oracle(rng):
    x8 = rng.integers(0, 256, size=(300, 16)).astype(np.uint8)
    bf = BruteforceIndex(L2Space(16))
    bf.add_items(x8, np.arange(300))
    d, l = bf.search_knn(x8[:4], 3)
    assert np.all(l[:, 0] == np.arange(4))
    assert np.all(d[:, 0] == 0.0)


def test_get_space_unknown():
    import pytest

    with pytest.raises(ValueError):
        get_space("cosine", 8)
