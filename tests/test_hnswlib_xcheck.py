"""Cross-validation against the REAL vendored hnswlib engine.

Round-3 verdict: every "hnswlib-equivalent" claim in this repo was tested
only against the repo's own reimplementation — a circular oracle. These
tests compile the actual reference engine (hnswlib/hnswalg.h, header-only)
and the reference's actual .adj loader (hnsw_service/hnsw_graph.cpp:14-151)
from /root/reference (untrusted: compiled and run isolated as test
subprocesses, never linked into hnsw_tpu) and verify:

1. recall parity: native/builder.cpp's CPU engine matches real hnswlib
   recall at equal M/efC/ef on the same data;
2. .adj interop (export): a repo-exported .adj parses through the
   reference's own loader to exactly the repo's neighbor lists;
3. .adj interop (import): a graph exported by the real hnswlib engine
   loads through io/adj.py to exactly what the reference loader sees.

Skips cleanly when g++ or /root/reference is unavailable.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "hnswlib_xcheck"))
import compile as xcheck_compile  # noqa: E402

pytestmark = pytest.mark.slow

N, DIM, M, EF_C, NQ, K, EF = 4000, 32, 8, 100, 400, 10, 100


def _binaries():
    try:
        b1 = xcheck_compile.build_xcheck_hnswlib()
        b2 = xcheck_compile.build_xcheck_adj()
    except RuntimeError as exc:
        pytest.skip(f"xcheck compile failed: {exc}")
    if b1 is None or b2 is None:
        pytest.skip("g++ or /root/reference unavailable")
    return b1, b2


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(64, DIM)).astype(np.float32)
    x = centers[rng.integers(0, 64, N)] + 0.4 * rng.normal(
        size=(N, DIM)
    ).astype(np.float32)
    q = x[rng.integers(0, N, NQ)] + 0.05 * rng.normal(size=(NQ, DIM)).astype(
        np.float32
    )
    d = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :K]
    return x, q, gt


@pytest.fixture(scope="module")
def hnswlib_run(dataset, tmp_path_factory):
    """Build+search with the real hnswlib engine; returns (ids, stats, adj)."""
    bin1, _ = _binaries()
    x, q, _ = dataset
    d = tmp_path_factory.mktemp("xcheck")
    x.tofile(d / "data.f32")
    q.tofile(d / "q.f32")
    r = subprocess.run(
        [bin1, "build_search", str(d / "data.f32"), str(N), str(DIM),
         str(M), str(EF_C), str(d / "q.f32"), str(NQ), str(K), str(EF),
         str(d / "ids.i64"), str(d / "graph.adj")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    ids = np.fromfile(d / "ids.i64", dtype=np.int64).reshape(NQ, K)
    return ids, stats, str(d / "graph.adj")


def _recall(ids, gt):
    return float(
        np.mean([len(set(ids[i]) & set(gt[i])) / K for i in range(len(gt))])
    )


def _parse_dump(path):
    """Parse xcheck_adj's dump: {level: {id: [neighbors]}} + header."""
    raw = np.fromfile(path, dtype=np.uint32)
    pos = 0
    entry, max_level, n_levels = raw[0], raw[1], raw[2]
    pos = 3
    levels = []
    for _ in range(n_levels):
        cnt = raw[pos]; pos += 1
        m = {}
        for _ in range(cnt):
            nid, deg = raw[pos], raw[pos + 1]; pos += 2
            m[int(nid)] = raw[pos:pos + deg].tolist(); pos += deg
        levels.append(m)
    assert pos == len(raw)
    return int(entry), int(max_level), levels


def _run_ref_loader(adj_path, tmp):
    _, bin2 = _binaries()
    dump = os.path.join(tmp, "dump.bin")
    with open(os.devnull, "w") as devnull:
        r = subprocess.run(
            [bin2, adj_path, dump], stdout=devnull,
            stderr=subprocess.PIPE, text=True, timeout=300,
        )
    assert r.returncode == 0, r.stderr[-2000:]
    return _parse_dump(dump)


def test_recall_parity_vs_real_hnswlib(dataset, hnswlib_run):
    """native/builder.cpp's engine vs the real hnswlib at equal M/efC/ef."""
    from hnsw_tpu.models.hnsw import HNSWIndex

    x, q, gt = dataset
    ref_ids, stats, _ = hnswlib_run
    ref_recall = _recall(ref_ids, gt)

    idx = HNSWIndex("l2", dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x)
    _, ours, _ = idx.search_cpu(q, k=K, ef=EF)
    our_recall = _recall(ours, gt)

    # Different level RNGs -> different graphs; the gate is recall parity.
    assert ref_recall >= 0.90, f"reference engine sanity: {ref_recall}"
    assert our_recall >= ref_recall - 0.01, (
        f"ours {our_recall:.4f} vs real hnswlib {ref_recall:.4f}"
    )


def test_filtered_search_parity_vs_real_hnswlib(dataset, tmp_path):
    """Filtered search (BaseFilterFunctor, hnswlib.h:128-132) vs the real
    engine: the repo's native CPU filter path AND the device filter_labels
    mask must match real-hnswlib filtered recall at equal M/efC/ef."""
    from hnsw_tpu.models.hnsw import HNSWIndex

    bin1, _ = _binaries()
    x, q, _ = dataset
    rng = np.random.default_rng(3)
    mask = rng.random(N) < 0.5  # admit ~half the labels

    # filtered exact ground truth
    d = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    d[:, ~mask] = np.inf
    gt = np.argsort(d, axis=1)[:, :K]

    td = tmp_path
    x.tofile(td / "data.f32")
    q.tofile(td / "q.f32")
    mask.astype(np.uint8).tofile(td / "mask.u8")
    r = subprocess.run(
        [bin1, "build_filter_search", str(td / "data.f32"), str(N), str(DIM),
         str(M), str(EF_C), str(td / "q.f32"), str(NQ), str(K), str(EF),
         str(td / "ids.i64"), str(td / "mask.u8")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref_ids = np.fromfile(td / "ids.i64", dtype=np.int64).reshape(NQ, K)
    assert all(mask[i] for i in ref_ids[ref_ids >= 0]), "ref leaked a label"
    ref_recall = _recall(ref_ids, gt)
    assert ref_recall >= 0.85, f"reference filtered sanity: {ref_recall}"

    idx = HNSWIndex("l2", dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x)
    _, cpu_ids, _ = idx.search_cpu(q, k=K, ef=EF, filter_labels=mask)
    assert not np.any(~mask[cpu_ids[cpu_ids >= 0]]), "cpu leaked a label"
    cpu_recall = _recall(cpu_ids, gt)
    assert cpu_recall >= ref_recall - 0.01, (
        f"native CPU {cpu_recall:.4f} vs real hnswlib {ref_recall:.4f}"
    )

    _, dev_ids = idx.search(q, k=K, ef=EF, filter_labels=mask)
    assert not np.any(~mask[dev_ids[dev_ids >= 0]]), "device leaked a label"
    dev_recall = _recall(dev_ids, gt)
    assert dev_recall >= ref_recall - 0.01, (
        f"device {dev_recall:.4f} vs real hnswlib {ref_recall:.4f}"
    )


def test_epsilon_search_parity_vs_real_hnswlib(dataset, tmp_path):
    """Range search vs the real engine's EpsilonSearchStopCondition
    (searchStopConditionClosest, hnswalg.h:1327-1378): per-query
    within-epsilon result sets must match real-hnswlib quality against the
    exact range ground truth."""
    from hnsw_tpu.models.hnsw import HNSWIndex
    from hnsw_tpu.models.multivector import epsilon_search

    bin1, _ = _binaries()
    x, q, _ = dataset
    max_c, min_c = 32, 8
    # epsilon at the ~20th-neighbor squared distance: most queries have a
    # nonempty, sub-max_c range set
    d = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    epsilon = float(np.median(np.sort(d, axis=1)[:, 20]))
    gt_sets = [
        set(np.where(d[i] <= epsilon)[0][np.argsort(d[i][d[i] <= epsilon])]
            [:max_c].tolist())
        for i in range(NQ)
    ]

    td = tmp_path
    x.tofile(td / "data.f32")
    q.tofile(td / "q.f32")
    r = subprocess.run(
        [bin1, "build_epsilon_search", str(td / "data.f32"), str(N),
         str(DIM), str(M), str(EF_C), str(td / "q.f32"), str(NQ), str(K),
         str(EF), str(td / "eids.i64"), repr(epsilon), str(min_c),
         str(max_c)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref_ids = np.fromfile(td / "eids.i64", dtype=np.int64).reshape(NQ, max_c)

    def set_recall(ids_row, gt):
        got = set(int(v) for v in ids_row if v >= 0)
        if not gt:
            return 1.0
        return len(got & gt) / len(gt)

    ref_rec = float(np.mean([set_recall(ref_ids[i], gt_sets[i])
                             for i in range(NQ)]))
    # the reference's stop is aggressive (it quits once the frontier
    # leaves the epsilon ball and min_candidates are found) — measured
    # ~0.72 set recall at min_c=1, ~0.8+ at min_c=8 on this data; the
    # sanity bar only guards that the mode ran sensibly
    assert ref_rec >= 0.6, f"reference epsilon sanity: {ref_rec}"

    idx = HNSWIndex("l2", dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x)
    dists, labels, valid = epsilon_search(
        idx, q, epsilon, min_candidates=min_c, max_candidates=max_c
    )
    # every within-epsilon claim must be true (distances are exact)
    dd = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    got_d = np.where(labels >= 0,
                     np.take_along_axis(dd, np.maximum(labels, 0), axis=1),
                     0.0)
    in_eps = got_d <= epsilon * (1 + 1e-5)
    rank = np.broadcast_to(np.arange(max_c)[None, :], labels.shape)
    ok = in_eps | (rank < min_c)
    assert np.all(ok[valid]), "returned a point outside epsilon"
    our_rec = float(np.mean([set_recall(labels[i][valid[i]], gt_sets[i])
                             for i in range(NQ)]))
    assert our_rec >= ref_rec - 0.01, (
        f"ours {our_rec:.4f} vs real hnswlib {ref_rec:.4f}"
    )


def test_u8_space_parity_vs_real_hnswlib(tmp_path):
    """Exact-uint8 tier vs the real engine's L2SpaceI (space_l2.h:294-323):
    recall parity at equal M/efC/ef AND bit-exact integer distances on both
    sides (the repo's l2u8 claim, verified against the reference engine)."""
    from hnsw_tpu.models.hnsw import HNSWIndex

    bin1, _ = _binaries()
    rng = np.random.default_rng(11)
    centers = rng.integers(60, 196, size=(64, DIM))
    x = np.clip(
        centers[rng.integers(0, 64, N)]
        + rng.integers(-40, 41, size=(N, DIM)),
        0, 255,
    ).astype(np.uint8)
    q = np.clip(
        x[rng.integers(0, N, NQ)].astype(np.int64)
        + rng.integers(-8, 9, size=(NQ, DIM)),
        0, 255,
    ).astype(np.uint8)
    d = ((q[:, None, :].astype(np.int64) - x[None].astype(np.int64)) ** 2
         ).sum(-1)
    gt = np.argsort(d, axis=1)[:, :K]

    td = tmp_path
    x.tofile(td / "data.u8")
    q.tofile(td / "q.u8")
    r = subprocess.run(
        [bin1, "build_search_u8", str(td / "data.u8"), str(N), str(DIM),
         str(M), str(EF_C), str(td / "q.u8"), str(NQ), str(K), str(EF),
         str(td / "ids.i64"), str(td / "dists.i32")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref_ids = np.fromfile(td / "ids.i64", dtype=np.int64).reshape(NQ, K)
    ref_dists = np.fromfile(td / "dists.i32", dtype=np.int32).reshape(NQ, K)
    # the reference's integer distances must equal exact int64 numpy
    exact_ref = np.take_along_axis(d, np.maximum(ref_ids, 0), axis=1)
    ok = ref_ids >= 0
    np.testing.assert_array_equal(ref_dists[ok], exact_ref[ok])
    ref_recall = _recall(ref_ids, gt)
    assert ref_recall >= 0.90, f"reference L2SpaceI sanity: {ref_recall}"

    idx = HNSWIndex("l2u8", dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x)
    our_d, our_ids = idx.search(q, k=K, ef=EF)
    our_recall = _recall(our_ids, gt)
    assert our_recall >= ref_recall - 0.01, (
        f"ours {our_recall:.4f} vs real hnswlib L2SpaceI {ref_recall:.4f}"
    )
    # our served distances are bit-exact integers too
    exact_ours = np.take_along_axis(d, np.maximum(our_ids, 0), axis=1)
    ok = our_ids >= 0
    np.testing.assert_array_equal(our_d[ok].astype(np.int64), exact_ours[ok])


def test_adj_export_loads_in_reference_loader(dataset, tmp_path):
    """Repo-exported .adj -> reference's own loader -> identical topology."""
    from hnsw_tpu.models.hnsw import HNSWIndex

    x, _, _ = dataset
    idx = HNSWIndex("l2", dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x[:1500])
    adj = str(tmp_path / "ours.adj")
    idx._builder.export_adj(adj)
    g = idx._builder.export_graph()

    entry, max_level, levels = _run_ref_loader(adj, str(tmp_path))
    assert entry == g.entry_point and max_level == g.max_level
    assert len(levels) == g.max_level + 1
    for lvl, m in enumerate(levels):
        expect_nodes = [
            i for i in range(g.num_nodes) if g.node_level[i] >= lvl
        ]
        # dump keys are the .adj label field; labels are sequential here
        assert sorted(m.keys()) == expect_nodes
        for nid in expect_nodes:
            assert m[nid] == g.neighbors(nid, lvl).tolist(), (
                f"level {lvl} node {nid}"
            )


def test_adj_import_from_real_hnswlib(hnswlib_run, tmp_path):
    """Real-hnswlib-exported .adj -> io/adj.py == the reference loader."""
    from hnsw_tpu.core.graph import check_integrity
    from hnsw_tpu.io.adj import read_adj

    _, _, adj_path = hnswlib_run
    g = read_adj(adj_path)
    # require_inbound=False: a real hnswlib graph may legitimately leave a
    # node with zero inbound level-0 edges (its own checkIntegrity counts
    # inbound across ALL levels, hnswalg.h:1397-1408).
    check_integrity(g, require_inbound=False)
    entry, max_level, levels = _run_ref_loader(adj_path, str(tmp_path))
    assert g.entry_point == entry and g.max_level == max_level
    for lvl, m in enumerate(levels):
        for nid, nbrs in m.items():
            assert g.neighbors(nid, lvl).tolist() == nbrs, (
                f"level {lvl} node {nid}"
            )
    # spot the level-0 coverage: every node present
    assert sorted(levels[0].keys()) == list(range(N))
