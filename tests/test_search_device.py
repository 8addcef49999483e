"""Device (batched beam) search: recall vs bruteforce oracle, parity vs the
native CPU engine, filters, deletes, metrics, entry override."""

import numpy as np
import pytest

from hnsw_tpu.core.spaces import L2Space
from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.models.hnsw import HNSWIndex, SearchParams

N, DIM = 3000, 32


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(99)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    idx = HNSWIndex("l2", dim=DIM, m=16, ef_construction=200)
    idx.add_items(x)
    oracle = BruteforceIndex(L2Space(DIM))
    oracle.add_items(x, np.arange(N))
    q = x[rng.integers(0, N, size=64)] + 0.01 * rng.normal(size=(64, DIM)).astype(
        np.float32
    )
    _, gt = oracle.search_knn(q, 10)
    return idx, x, q, gt


def _recall(got, gt):
    k = gt.shape[1]
    return np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(len(gt))])


def test_device_recall(built):
    idx, x, q, gt = built
    d, labels = idx.search(q, k=10, ef=100)
    r = _recall(labels, gt)
    assert r >= 0.95, f"device recall {r}"
    # distances ascending
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_device_matches_cpu_engine(built):
    """Same graph, same ef: device beam recall should track the native CPU
    heap search closely (fixed-beam vs adaptive heap differ slightly)."""
    idx, x, q, gt = built
    _, dev_labels = idx.search(q, k=10, ef=64)
    _, cpu_labels, _ = idx.search_cpu(q, k=10, ef=64)
    r_dev = _recall(dev_labels, gt)
    r_cpu = _recall(cpu_labels, gt)
    assert r_dev >= r_cpu - 0.05, f"device {r_dev} vs cpu {r_cpu}"


def test_exact_self_queries(built):
    idx, x, q, gt = built
    d, labels = idx.search(x[:32], k=1, ef=50)
    assert np.mean(labels[:, 0] == np.arange(32)) >= 0.95
    assert np.all(d[labels[:, 0] == np.arange(32), 0] < 1e-3)


def test_expand_multi(built):
    idx, x, q, gt = built
    d, labels = idx.search(q, k=10, ef=100, params=SearchParams(k=10, ef=100, expand=4))
    assert _recall(labels, gt) >= 0.95


def test_collect_metrics(built):
    idx, x, q, gt = built
    idx.search(q, k=10, ef=64, params=SearchParams(k=10, ef=64, collect_metrics=True))
    m = idx.last_metrics
    assert np.all(m.hops > 0)
    assert np.all(m.dist_comps > 10)


def test_filter(built):
    idx, x, q, gt = built
    mask = np.zeros(N, dtype=bool)
    mask[::3] = True
    d, labels = idx.search(q, k=10, ef=150, filter_labels=mask)
    valid = labels >= 0
    assert valid.any()
    assert np.all(labels[valid] % 3 == 0)


def test_delete_mark(built):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(500, 16)).astype(np.float32)
    idx = HNSWIndex("l2", dim=16, m=8, ef_construction=100)
    idx.add_items(x)
    d, l = idx.search(x[42:43], k=1, ef=50)
    assert l[0, 0] == 42
    idx.mark_deleted(42)
    d, l = idx.search(x[42:43], k=5, ef=50)
    assert 42 not in l[0]
    idx.unmark_deleted(42)
    d, l = idx.search(x[42:43], k=1, ef=50)
    assert l[0, 0] == 42


def test_ip_space_recall(rng):
    x = rng.normal(size=(1500, 24)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = HNSWIndex("ip", dim=24, m=16, ef_construction=200)
    idx.add_items(x)
    from hnsw_tpu.core.spaces import IPSpace

    oracle = BruteforceIndex(IPSpace(24))
    oracle.add_items(x, np.arange(1500))
    q = x[:32]
    _, gt = oracle.search_knn(q, 10)
    _, labels = idx.search(q, k=10, ef=100)
    assert _recall(labels, gt) >= 0.9


def test_entry_seeds_landmark_mode(built):
    """Landmark-seeded entry (SearchParams.entry_seeds): one MXU matmul
    against all upper-level nodes replaces the greedy descent. The seed set
    contains an exact argmin over the landmarks, so recall must match the
    descent path; output stays sorted; filters still apply."""
    idx, x, q, gt = built
    d0, l0 = idx.search(q, k=10, ef=100)
    d1, l1 = idx.search(q, k=10, ef=100, params=SearchParams(
        k=10, ef=100, entry_seeds=4))
    r0, r1 = _recall(l0, gt), _recall(l1, gt)
    assert r1 >= r0 - 0.01, f"seeded {r1} vs descent {r0}"
    assert np.all(np.diff(d1, axis=1) >= -1e-6)
    # no duplicate results per row
    for row in l1:
        v = row[row >= 0]
        assert len(set(v)) == len(v)
    # filtered search through the seeded path (seeds may be ineligible:
    # they must still work as waypoints, not results)
    mask = np.zeros(N, dtype=bool)
    mask[::2] = True
    _, lf = idx.search(q, k=10, ef=100, filter_labels=mask,
                       params=SearchParams(k=10, ef=100, entry_seeds=4))
    assert all(v % 2 == 0 for v in lf.ravel() if v >= 0)
    # speed-mode knobs compose with seeding
    _, ls = idx.search(q, k=10, ef=100, params=SearchParams(
        k=10, ef=100, entry_seeds=8, stop_frontier=1.15, max_iters=40))
    assert _recall(ls, gt) >= r0 - 0.02


def test_entry_seeds_pool(built):
    """seed_pool: strided level-0 nodes enlarge the landmark pool. The pool
    is a strict superset of the upper-node set, so seeded recall must not
    drop; the pool ids must be valid (search stays well-formed) and the
    cache must key on the pool size."""
    idx, x, q, gt = built
    _, l0 = idx.search(q, k=10, ef=100, entry_seeds=4)
    r0 = _recall(l0, gt)
    d2, l2 = idx.search(q, k=10, ef=100, entry_seeds=4, seed_pool=256)
    r2 = _recall(l2, gt)
    assert r2 >= r0 - 0.01, f"pooled {r2} vs upper-only {r0}"
    assert np.all(np.diff(d2, axis=1) >= -1e-6)
    for row in l2:
        v = row[row >= 0]
        assert len(set(v)) == len(v)
    # pool larger than the dataset clamps instead of failing
    _, l3 = idx.search(q, k=10, ef=100, entry_seeds=4, seed_pool=10 * N)
    assert _recall(l3, gt) >= r0 - 0.01
    # landmark cache distinguishes pool sizes (upper-only pool again)
    lm_plain = idx._landmark_arrays(*idx._sync_device()[:3])
    lm_pool = idx._landmark_arrays(*idx._sync_device()[:3], pool_extra=256)
    assert int(lm_pool[1].shape[0]) > int(lm_plain[1].shape[0])
    assert int(lm_pool[1].shape[0]) <= int(lm_plain[1].shape[0]) + 256
