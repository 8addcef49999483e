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
        get_space("hamming", 8)


def test_cosine_space(rng, tmp_path):
    """Cosine = normalize + IP (hnswlib's documented recipe; the reference
    ships only L2/IP). Unnormalized data and queries must rank by cosine
    similarity, and the normalization must survive save/load."""
    from hnsw_tpu.models.hnsw import HNSWIndex

    x = rng.normal(size=(2000, 24)).astype(np.float32)
    x *= rng.uniform(0.1, 10.0, size=(2000, 1)).astype(np.float32)  # scales
    idx = HNSWIndex("cosine", dim=24, m=8, ef_construction=80)
    idx.add_items(x)
    q = x[:64] * rng.uniform(0.5, 2.0, size=(64, 1)).astype(np.float32)
    d, l = idx.search(q, k=5, ef=80)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gt = np.argsort(1.0 - qn @ xn.T, axis=1)[:, :1]
    assert np.mean(l[:, 0] == gt[:, 0]) >= 0.95
    # scaling a query must not change its result (direction-only)
    d2, l2 = idx.search(q * 7.5, k=5, ef=80)
    np.testing.assert_array_equal(l, l2)

    p = str(tmp_path / "cos.npz")
    idx.save(p)
    idx2 = HNSWIndex.load(p)
    assert idx2.space.persist_name == "cosine"
    d3, l3 = idx2.search(q, k=5, ef=80)
    np.testing.assert_array_equal(l, l3)
