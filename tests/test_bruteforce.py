"""BruteforceIndex parity with reference semantics (hnswlib/bruteforce.h):
add/overwrite by label, swap-delete, filtered search, save/load."""

import numpy as np

from hnsw_tpu.core.spaces import L2Space, IPSpace
from hnsw_tpu.models.bruteforce import BruteforceIndex


def _np_knn(q, x, k):
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, 1), idx


def test_search_matches_numpy(rng):
    x = rng.normal(size=(300, 20)).astype(np.float32)
    idx = BruteforceIndex(L2Space(20))
    idx.add_items(x, np.arange(300))
    q = rng.normal(size=(5, 20)).astype(np.float32)
    d, labels = idx.search_knn(q, 7)
    wd, wi = _np_knn(q, x, 7)
    np.testing.assert_allclose(d, wd, rtol=1e-3, atol=1e-3)
    for b in range(5):
        assert set(labels[b]) == set(wi[b])


def test_overwrite_by_label(rng):
    idx = BruteforceIndex(L2Space(4))
    idx.add_point(np.ones(4), 7)
    idx.add_point(np.zeros(4), 7)  # overwrite
    assert idx.num_elements == 1
    d, l = idx.search_knn(np.zeros((1, 4)), 1)
    assert l[0, 0] == 7 and d[0, 0] < 1e-6


def test_remove_swap_delete(rng):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    idx = BruteforceIndex(L2Space(8))
    idx.add_items(x, np.arange(50))
    idx.remove_point(10)
    assert idx.num_elements == 49
    d, l = idx.search_knn(x[10:11], 5)
    assert 10 not in l[0]
    # other points still retrievable exactly
    d, l = idx.search_knn(x[20:21], 1)
    assert l[0, 0] == 20 and d[0, 0] < 1e-6


def test_filtered_search(rng):
    x = rng.normal(size=(100, 6)).astype(np.float32)
    idx = BruteforceIndex(L2Space(6))
    idx.add_items(x, np.arange(100))
    mask = np.zeros(100, dtype=bool)
    mask[::2] = True  # only even labels eligible
    q = rng.normal(size=(3, 6)).astype(np.float32)
    _, l = idx.search_knn(q, 5, filter_labels=mask)
    assert np.all(l % 2 == 0)


def test_ip_space(rng):
    x = rng.normal(size=(80, 12)).astype(np.float32)
    idx = BruteforceIndex(IPSpace(12))
    idx.add_items(x, np.arange(80))
    q = rng.normal(size=(2, 12)).astype(np.float32)
    d, l = idx.search_knn(q, 4)
    full = 1.0 - q @ x.T
    wi = np.argsort(full, axis=1)[:, :4]
    for b in range(2):
        assert set(l[b]) == set(wi[b])


def test_save_load(tmp_path, rng):
    x = rng.normal(size=(60, 10)).astype(np.float32)
    idx = BruteforceIndex(L2Space(10))
    idx.add_items(x, np.arange(100, 160))
    p = str(tmp_path / "bf.bin")
    idx.save(p)
    idx2 = BruteforceIndex.load(p)
    q = rng.normal(size=(3, 10)).astype(np.float32)
    d1, l1 = idx.search_knn(q, 5)
    d2, l2 = idx2.search_knn(q, 5)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    np.testing.assert_array_equal(l1, l2)


def test_bulk_add_matches_sequential(rng):
    """Vectorized add_items (all-new fast path) must equal per-point inserts,
    including batches with duplicate labels and overwrites (fallback path)."""
    x = rng.normal(size=(300, 16)).astype(np.float32)
    labs = np.arange(300)
    bulk = BruteforceIndex(L2Space(16))
    bulk.add_items(x, labs)
    seq = BruteforceIndex(L2Space(16))
    for row, lab in zip(x, labs):
        seq.add_point(row, int(lab))
    q = rng.normal(size=(4, 16)).astype(np.float32)
    d1, l1 = bulk.search_knn(q, 7)
    d2, l2 = seq.search_knn(q, 7)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    np.testing.assert_array_equal(l1, l2)
    # overwrite + intra-batch duplicate → fallback path, last write wins
    y = rng.normal(size=(3, 16)).astype(np.float32)
    bulk.add_items(y, np.array([5, 999, 999]))
    assert bulk.num_elements == 301
    d, l = bulk.search_knn(y[2:3], 1)
    assert l[0, 0] == 999 and d[0, 0] < 1e-5


def test_oracle_exact_on_near_tie_clustered_data(rng):
    """The oracle must rank near-tie neighbors exactly (float64 ground
    truth). On TPU the MXU rounds f32 matmul inputs to bf16 by default,
    which misranked 1.25% of true 10-NN on 244-point clusters until the
    oracle forced precision="highest" — the recall ceilings measured
    against the scrambled GT (0.9875 at 100k/409c) were measurement error,
    not search error. Guard the exactness contract (bruteforce.h:106-135
    is exact by construction)."""
    n, dim, nc, k = 20_000, 64, 80, 10
    centers = rng.normal(size=(nc, dim)).astype(np.float32)
    x = centers[rng.integers(0, nc, n)] + 0.5 * rng.normal(
        size=(n, dim)
    ).astype(np.float32)
    q = x[rng.integers(0, n, 64)] + 0.05 * rng.normal(size=(64, dim)).astype(
        np.float32
    )
    xsq = (x.astype(np.float64) ** 2).sum(-1)
    d = xsq[None, :] - 2.0 * (q.astype(np.float64) @ x.T.astype(np.float64))
    idx64 = np.argsort(d, axis=1)[:, :k]

    oracle = BruteforceIndex(L2Space(dim))
    oracle.add_items(x, np.arange(n))
    _, labels = oracle.search_knn(q, k)
    agree = np.mean(
        [len(set(labels[i]) & set(idx64[i])) / k for i in range(64)]
    )
    assert agree == 1.0, agree
