"""Targeted update repair (updatePoint / repairConnectionsForUpdate parity,
hnswlib/hnswalg.h:995-1150): an in-place vector update re-selects the links
of every current 1-hop neighbor from the 2-hop candidate set around the
moved point (phase 1) and then re-links the node itself from a fresh entry
descent (phase 2). Under heavy update churn the graph must stay within a
hair of a fresh rebuild's recall — stale edges around moved points are
exactly what the neighborhood-repair phase removes."""

import os
import subprocess
import sys

import numpy as np
import pytest

from hnsw_tpu.core.graph import check_integrity
from hnsw_tpu.core.spaces import L2Space
from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "hnswlib_xcheck"))
import compile as xcheck_compile  # noqa: E402

N, DIM, M, EFC = 4000, 32, 16, 200


def _recall_cpu(b, x, rng, k=10, ef=100, nq=200):
    oracle = BruteforceIndex(L2Space(DIM))
    oracle.add_items(x, np.arange(len(x)))
    q = x[rng.integers(0, len(x), nq)] + 0.01 * rng.normal(
        size=(nq, DIM)
    ).astype(np.float32)
    _, gt = oracle.search_knn(q, k)
    _, got, _ = b.search_batch(q, k, ef=ef)
    return np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(nq)])


@pytest.mark.slow
def test_update_churn_matches_rebuild_and_hnswlib():
    rng = np.random.default_rng(11)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    b = NativeHNSWBuilder(dim=DIM, space="l2", m=M, ef_construction=EFC)
    b.add_batch(x, np.arange(N))

    # churn: move 25% of the points to brand-new locations, one at a time
    n_upd = N // 4
    ids = rng.choice(N, size=n_upd, replace=False)
    x2 = x.copy()
    x2[ids] = rng.normal(size=(n_upd, DIM)).astype(np.float32)
    for i in ids:
        b.add(x2[i], int(i))  # existing label -> update path
    assert b.size == N

    g = b.export_graph()
    check_integrity(g, require_inbound=False)
    np.testing.assert_array_equal(b.export_vectors(), x2)

    fresh = NativeHNSWBuilder(dim=DIM, space="l2", m=M, ef_construction=EFC)
    fresh.add_batch(x2, np.arange(N))

    qrng = np.random.default_rng(5)
    nq, k, ef = 200, 10, 100
    q = x2[qrng.integers(0, N, nq)] + 0.01 * qrng.normal(
        size=(nq, DIM)
    ).astype(np.float32)
    oracle = BruteforceIndex(L2Space(DIM))
    oracle.add_items(x2, np.arange(N))
    _, gt = oracle.search_knn(q, k)

    def recall(ids_got):
        return np.mean(
            [len(set(ids_got[i]) & set(gt[i])) / k for i in range(nq)]
        )

    _, got, _ = b.search_batch(q, k, ef=ef)
    r_churn = recall(got)
    _, got_f, _ = fresh.search_batch(q, k, ef=ef)
    r_fresh = recall(got_f)
    # churned graph stays within a hair of a fresh rebuild
    assert r_churn >= r_fresh - 0.004, (r_churn, r_fresh)

    # semantics gate: the REAL hnswlib engine under the identical churn
    # (addPoint on existing labels -> updatePoint, hnswalg.h:965-1150)
    try:
        bin1 = xcheck_compile.build_xcheck_hnswlib()
    except RuntimeError as exc:
        pytest.skip(f"xcheck compile failed: {exc}")
    if bin1 is None:
        pytest.skip("g++ or /root/reference unavailable")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        x.tofile(f"{td}/data.f32")
        q.tofile(f"{td}/q.f32")
        x2[ids].astype(np.float32).tofile(f"{td}/upd.f32")
        ids.astype(np.uint32).tofile(f"{td}/upd_ids.u32")
        r = subprocess.run(
            [bin1, "build_churn_search", f"{td}/data.f32", str(N), str(DIM),
             str(M), str(EFC), f"{td}/q.f32", str(nq), str(k), str(ef),
             f"{td}/ids.i64", f"{td}/upd.f32", f"{td}/upd_ids.u32",
             str(n_upd)],
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        ref_ids = np.fromfile(f"{td}/ids.i64", dtype=np.int64).reshape(nq, k)
    r_ref = recall(ref_ids)
    # parity with the reference's own update-repair under equal churn
    assert r_churn >= r_ref - 0.005, (r_churn, r_ref)


def test_update_repairs_neighbor_links():
    """A point moved far away must stop polluting its old neighborhood:
    the old neighbors re-select their links (phase 1), so a search near
    the OLD location does not return the moved point, and a search at the
    NEW location finds it at distance ~0."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, DIM)).astype(np.float32)
    b = NativeHNSWBuilder(dim=DIM, space="l2", m=8, ef_construction=100)
    b.add_batch(x, np.arange(500))

    old_pos = x[7].copy()
    far = np.full(DIM, 40.0, dtype=np.float32)
    b.add(far, 7)

    d, l = b.search(far, k=1, ef=64)
    assert l[0] == 7 and d[0] < 1e-3
    d2, l2 = b.search(old_pos, k=10, ef=64)
    assert 7 not in set(l2)
    check_integrity(b.export_graph())


def test_update_keeps_device_parity():
    """The update's row deltas (its own row + repaired neighbors + in-
    neighbor inline rows) must leave the device search agreeing with the
    CPU engine on the moved point."""
    import jax

    from hnsw_tpu.models.hnsw import HNSWIndex

    rng = np.random.default_rng(9)
    x = rng.normal(size=(800, DIM)).astype(np.float32)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=100)
    idx.add_items(x, np.arange(800))
    idx._sync_device()
    moved = rng.normal(size=(20, DIM)).astype(np.float32) + 3.0
    labs = np.arange(100, 120)
    idx.add_items(moved, labs)
    d, l = idx.search(moved, k=1, ef=64)
    np.testing.assert_array_equal(l[:, 0], labs)
    assert (d[:, 0] < 1e-3).all()
