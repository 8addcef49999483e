"""Device-accelerated bulk build: graph validity and recall parity with the
incremental host builder."""

import numpy as np
import pytest

from hnsw_tpu.core.graph import check_integrity
from hnsw_tpu.core.spaces import L2Space
from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.models.bulk_build import bulk_build
from hnsw_tpu.models.hnsw import HNSWIndex

N, DIM = 3000, 32


def _recall(got, gt):
    k = gt.shape[1]
    return np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(len(gt))])


@pytest.mark.slow
def test_bulk_build_recall_parity(rng):
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    oracle = BruteforceIndex(L2Space(DIM))
    oracle.add_items(x, np.arange(N))
    q = x[rng.integers(0, N, 64)] + 0.01 * rng.normal(size=(64, DIM)).astype(
        np.float32
    )
    _, gt = oracle.search_knn(q, 10)

    bulk = bulk_build(x, m=16, ef_construction=100, first_wave=512)
    assert bulk.num_elements == N
    check_integrity(bulk.graph, require_inbound=False)
    _, l_bulk = bulk.search(q, k=10, ef=100)

    host = HNSWIndex("l2", dim=DIM, m=16, ef_construction=100)
    host.add_items(x)
    _, l_host = host.search(q, k=10, ef=100)

    r_bulk, r_host = _recall(l_bulk, gt), _recall(l_host, gt)
    assert r_bulk >= r_host - 0.05, (r_bulk, r_host)
    assert r_bulk >= 0.9, r_bulk


@pytest.mark.slow
def test_bulk_build_seeded_waves(rng):
    """wave_entry_seeds (landmark-seeded wave entry) must preserve graph
    validity and recall parity with the unseeded wave build."""
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    oracle = BruteforceIndex(L2Space(DIM))
    oracle.add_items(x, np.arange(N))
    q = x[rng.integers(0, N, 64)] + 0.01 * rng.normal(size=(64, DIM)).astype(
        np.float32
    )
    _, gt = oracle.search_knn(q, 10)

    seeded = bulk_build(
        x, m=16, ef_construction=100, first_wave=512,
        wave_stop_frontier=1.15, wave_entry_seeds=4, wave_seed_pool=64,
    )
    assert seeded.num_elements == N
    check_integrity(seeded.graph, require_inbound=False)
    _, l_seeded = seeded.search(q, k=10, ef=100)

    plain = bulk_build(x, m=16, ef_construction=100, first_wave=512)
    _, l_plain = plain.search(q, k=10, ef=100)

    r_seeded, r_plain = _recall(l_seeded, gt), _recall(l_plain, gt)
    assert r_seeded >= r_plain - 0.05, (r_seeded, r_plain)
    assert r_seeded >= 0.9, r_seeded


@pytest.mark.slow
def test_bulk_build_checkpoint_resume(rng, tmp_path, monkeypatch):
    """Elastic recovery: kill the build mid-wave, resume from the periodic
    checkpoint, and the finished index must match a straight-through build
    in size, integrity, and recall."""
    from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder

    x = rng.normal(size=(N, DIM)).astype(np.float32)
    ck = str(tmp_path / "b")

    calls = {"n": 0}
    orig = NativeHNSWBuilder.connect_batch

    def dying_connect(self, ids, sel):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated process death")
        return orig(self, ids, sel)

    monkeypatch.setattr(NativeHNSWBuilder, "connect_batch", dying_connect)
    try:
        bulk_build(
            x, m=8, ef_construction=64, first_wave=256,
            checkpoint=ck, checkpoint_every_s=0.0,
        )
        raise AssertionError("expected simulated death")
    except RuntimeError:
        pass
    monkeypatch.setattr(NativeHNSWBuilder, "connect_batch", orig)

    idx = bulk_build(
        x, m=8, ef_construction=64, first_wave=256,
        checkpoint=ck, checkpoint_every_s=0.0,
    )
    assert idx.num_elements == N
    check_integrity(idx.graph, require_inbound=False)
    q = x[rng.integers(0, N, 32)]
    _, labels = idx.search(q, k=1, ef=64)
    oracle = BruteforceIndex(L2Space(DIM))
    oracle.add_items(x, np.arange(N))
    _, gt = oracle.search_knn(q, 1)
    assert _recall(labels, gt) >= 0.9


@pytest.mark.slow
def test_bulk_build_supports_incremental_after(rng):
    x = rng.normal(size=(800, DIM)).astype(np.float32)
    idx = bulk_build(x, m=8, ef_construction=64, first_wave=256)
    extra = rng.normal(size=(50, DIM)).astype(np.float32)
    idx.add_items(extra, labels=np.arange(1000, 1050))
    assert idx.num_elements == 850
    d, l = idx.search(extra[:4], k=1, ef=64)
    assert np.all(l[:, 0] == np.arange(1000, 1004))
    idx.mark_deleted(1000)
    d, l = idx.search(extra[:1], k=5, ef=64)
    assert 1000 not in l[0]


@pytest.mark.slow
def test_bulk_build_recursive_upper(rng):
    """The recursive (device-wave) upper phase must match the serial host
    upper phase in graph validity and recall."""
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    oracle = BruteforceIndex(L2Space(DIM))
    oracle.add_items(x, np.arange(N))
    q = x[rng.integers(0, N, 64)] + 0.01 * rng.normal(size=(64, DIM)).astype(
        np.float32
    )
    _, gt = oracle.search_knn(q, 10)

    rec = bulk_build(
        x, m=16, ef_construction=100, first_wave=512, upper_recurse_min=50,
    )
    assert rec.num_elements == N
    check_integrity(rec.graph, require_inbound=False)
    g = rec.graph
    assert g.max_level >= 1
    # upper-level nodes must carry level-1 links capped at M
    assert g.upper.shape[2] == 16
    _, l_rec = rec.search(q, k=10, ef=100)
    r_rec = _recall(l_rec, gt)

    host = bulk_build(x, m=16, ef_construction=100, first_wave=512)
    _, l_host = host.search(q, k=10, ef=100)
    r_host = _recall(l_host, gt)
    assert r_rec >= r_host - 0.05, (r_rec, r_host)
    assert r_rec >= 0.9, r_rec
