"""Native C++ builder: graph invariants (checkIntegrity parity,
hnswlib/hnswalg.h:1381-1410), CPU search recall vs bruteforce oracle,
update/delete semantics."""

import numpy as np
import pytest

from hnsw_tpu.core.graph import check_integrity
from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.core.spaces import L2Space
from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(42)
    x = rng.normal(size=(2000, 32)).astype(np.float32)
    b = NativeHNSWBuilder(dim=32, space="l2", m=16, ef_construction=200)
    b.add_batch(x, np.arange(2000))
    return b, x


def test_build_and_integrity(small_index):
    b, x = small_index
    assert b.size == 2000
    g = b.export_graph()
    assert g.num_nodes == 2000
    assert g.max_m0 == 32
    check_integrity(g)


def test_vectors_roundtrip(small_index):
    b, x = small_index
    np.testing.assert_array_equal(b.export_vectors(), x)


def test_cpu_search_recall(small_index):
    b, x = small_index
    oracle = BruteforceIndex(L2Space(32))
    oracle.add_items(x, np.arange(2000))
    rng = np.random.default_rng(7)
    q = x[rng.integers(0, 2000, size=50)] + 0.01 * rng.normal(size=(50, 32)).astype(
        np.float32
    )
    _, gt = oracle.search_knn(q, 10)
    _, got, cnt = b.search_batch(q, 10, ef=100)
    assert np.all(cnt == 10)
    recall = np.mean(
        [len(set(got[i]) & set(gt[i])) / 10.0 for i in range(50)]
    )
    assert recall >= 0.95, f"recall {recall}"


def test_update_point():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    b = NativeHNSWBuilder(dim=8, space="l2", m=8, ef_construction=100)
    b.add_batch(x, np.arange(200))
    # move label 5 to a far-away location, then search for it there
    target = np.full(8, 50.0, dtype=np.float32)
    b.add(target, 5)
    assert b.size == 200  # update, not insert
    d, l = b.search(target, k=1, ef=50)
    assert l[0] == 5 and d[0] < 1e-3
    check_integrity(b.export_graph())


def test_mark_deleted():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 8)).astype(np.float32)
    b = NativeHNSWBuilder(dim=8, space="l2", m=8, ef_construction=100)
    b.add_batch(x, np.arange(300))
    d, l = b.search(x[17], k=1, ef=50)
    assert l[0] == 17
    b.mark_deleted(17)
    assert b.num_deleted == 1
    d, l = b.search(x[17], k=5, ef=50)
    assert 17 not in l
    b.unmark_deleted(17)
    d, l = b.search(x[17], k=1, ef=50)
    assert l[0] == 17
    with pytest.raises(KeyError):
        b.mark_deleted(99999)


def test_level_distribution():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5000, 4)).astype(np.float32)
    b = NativeHNSWBuilder(dim=4, space="l2", m=16, ef_construction=50)
    b.add_batch(x, np.arange(5000))
    g = b.export_graph()
    frac_upper = np.mean(g.node_level >= 1)
    # P(level >= 1) = exp(-ln M) = 1/16 ≈ 0.0625
    assert 0.03 < frac_upper < 0.10, frac_upper
    assert g.max_level >= 1


def test_accessors_get_data_by_label(small_index):
    """getDataByLabel / getMaxElements / getDeletedCount analogs
    (hnswalg.h:826-851, 213-223)."""
    b, x = small_index
    v = b.get_data_by_label(123)
    np.testing.assert_allclose(v, x[123], rtol=1e-6)
    assert b.capacity >= b.size
    with pytest.raises(KeyError):
        b.get_data_by_label(777_777)


def test_index_level_accessors():
    from hnsw_tpu.models.hnsw import HNSWIndex

    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 16)).astype(np.float32)
    idx = HNSWIndex("l2", dim=16, m=8, ef_construction=60)
    idx.add_items(x, np.arange(100, 400))
    got = idx.get_items([100, 250, 399])
    np.testing.assert_allclose(got, x[[0, 150, 299]], rtol=1e-6)
    assert idx.max_elements >= idx.num_elements == 300
    assert idx.deleted_count == 0
    idx.mark_deleted(250)
    assert idx.deleted_count == 1
    with pytest.raises(KeyError):
        idx.get_items([250])  # delete-marked, matches the reference throw


def test_clear_and_index_file_size():
    """clear() / indexFileSize() analogs (hnswalg.h:149-161, 658-683)."""
    from hnsw_tpu.models.hnsw import HNSWIndex

    rng = np.random.default_rng(4)
    x = rng.normal(size=(400, 16)).astype(np.float32)
    idx = HNSWIndex("l2", dim=16, m=8, ef_construction=60)
    idx.add_items(x)
    # file-size formula: header + n * (level0 block + vector + label) +
    # per-node upper lists — must grow with n and match the closed form
    # for the level-0-only part.
    sz = idx.index_file_size
    g = idx.graph
    per_elem = (2 * 8 * 4 + 4) + 16 * 4 + 8
    header = 10 * 8 + 4 + 4 + 8
    upper = sum(
        4 + (8 * 4 + 4) * int(l) if l > 0 else 4 for l in g.node_level
    )
    assert sz == header + 400 * per_elem + upper

    d0, l0 = idx.search(x[:8], k=5, ef=50)
    assert (np.asarray(l0)[:, 0] == np.arange(8)).all()

    idx.clear()
    assert idx.num_elements == 0
    assert idx.deleted_count == 0
    assert idx.index_file_size == header
    # the same handle rebuilds cleanly after clear
    idx.add_items(x[:200])
    assert idx.num_elements == 200
    d1, l1 = idx.search(x[:8], k=5, ef=50)
    assert (np.asarray(l1)[:, 0] == np.arange(8)).all()
