"""hnswlib binary index (.bin) interop, validated against the REAL engine.

The reference's native persistence is saveIndex/loadIndex
(hnswlib/hnswalg.h:685-822; the service loads a .bin at
hnsw_service/main.cpp:55). These tests prove both directions through the
actual compiled reference engine (tests/hnswlib_xcheck — built from
/root/reference at test time, never copied):

1. import: an index the real engine SAVED parses via io/hnswbin.read_bin to
   exactly the topology the engine's own .adj export reports, with
   bit-identical vectors/labels, and from_hnswlib serves it at parity;
2. export: an index built here and written by save_hnswlib LOADS in the
   real engine (its loadIndex corruption scan passes) and searches to the
   same results as our CPU engine on the same graph;
3. pure round-trip (fast, no real engine): write_bin -> read_bin is exact
   for every space, including delete marks and the u8/L2SpaceI layout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "hnswlib_xcheck"))
import compile as xcheck_compile  # noqa: E402

from hnsw_tpu.io.adj import read_adj
from hnsw_tpu.io.hnswbin import read_bin, write_bin
from hnsw_tpu.models.hnsw import HNSWIndex

N, DIM, M, EF_C, NQ, K, EF = 4000, 32, 8, 100, 400, 10, 100


def _engine():
    try:
        b = xcheck_compile.build_xcheck_hnswlib()
    except RuntimeError as exc:
        pytest.skip(f"xcheck compile failed: {exc}")
    if b is None:
        pytest.skip("g++ or /root/reference unavailable")
    return b


def _dataset(n=N, dim=DIM, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(64, dim)).astype(np.float32)
    x = centers[rng.integers(0, 64, n)] + 0.4 * rng.normal(
        size=(n, dim)
    ).astype(np.float32)
    q = x[rng.integers(0, n, NQ)] + 0.05 * rng.normal(size=(NQ, dim)).astype(
        np.float32
    )
    d = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :K]
    return x, q, gt


def _graphs_equal(ga, gb):
    assert ga.num_nodes == gb.num_nodes
    assert ga.entry_point == gb.entry_point
    assert ga.max_level == gb.max_level
    np.testing.assert_array_equal(ga.labels, gb.labels)
    np.testing.assert_array_equal(ga.node_level, gb.node_level)
    for node in range(ga.num_nodes):
        for level in range(int(ga.node_level[node]) + 1):
            np.testing.assert_array_equal(
                ga.neighbors(node, level), gb.neighbors(node, level),
                err_msg=f"node {node} level {level}",
            )


def _recall(ids, gt):
    return float(
        np.mean([len(set(ids[i]) & set(gt[i])) / K for i in range(len(gt))])
    )


@pytest.mark.slow
def test_real_engine_bin_imports(tmp_path):
    """A .bin the real engine saved round-trips into the repo: topology
    identical to the engine's own .adj view, vectors bit-exact, and the
    imported index serves at recall parity."""
    eng = _engine()
    x, q, gt = _dataset()
    x.tofile(tmp_path / "data.f32")
    q.tofile(tmp_path / "q.f32")
    r = subprocess.run(
        [eng, "build_search", str(tmp_path / "data.f32"), str(N), str(DIM),
         str(M), str(EF_C), str(tmp_path / "q.f32"), str(NQ), str(K),
         str(EF), str(tmp_path / "ids.i64"), str(tmp_path / "graph.adj"),
         str(tmp_path / "index.bin")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref_ids = np.fromfile(tmp_path / "ids.i64", dtype=np.int64).reshape(
        NQ, K
    )

    g, vectors, deleted, meta = read_bin(str(tmp_path / "index.bin"))
    assert meta["m"] == M and meta["ef_construction"] == EF_C
    assert meta["dim"] == DIM
    np.testing.assert_array_equal(vectors, x)  # bit-exact stored data
    assert not deleted.any()
    _graphs_equal(g, read_adj(str(tmp_path / "graph.adj"), max_m=M))

    idx = HNSWIndex.from_hnswlib(str(tmp_path / "index.bin"))
    _, ids, _ = idx.search_cpu(q, k=K, ef=EF)
    ours, ref = _recall(ids, gt), _recall(ref_ids, gt)
    assert abs(ours - ref) < 0.01, (ours, ref)
    # same graph + same vectors: per-query results agree up to distance ties
    overlap = np.mean(
        [len(set(ids[i]) & set(ref_ids[i])) / K for i in range(NQ)]
    )
    assert overlap > 0.99, overlap


@pytest.mark.slow
def test_write_bin_loads_in_real_engine(tmp_path):
    """An index built HERE, exported by save_hnswlib, passes the real
    engine's loadIndex corruption scan and searches to the same results —
    including delete marks."""
    eng = _engine()
    x, q, gt = _dataset(seed=11)
    idx = HNSWIndex("l2", dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x)
    # delete a slice so DELETE_MARK bytes are exercised end-to-end
    dead = np.arange(0, N, 97)
    for label in dead:
        idx.mark_deleted(int(label))
    idx.save_hnswlib(str(tmp_path / "ours.bin"))

    q.tofile(tmp_path / "q.f32")
    r = subprocess.run(
        [eng, "load_search", str(tmp_path / "ours.bin"), str(DIM),
         str(tmp_path / "q.f32"), str(NQ), str(K), str(EF),
         str(tmp_path / "ref_ids.i64")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]  # loadIndex scan passed
    json.loads(r.stdout.strip().splitlines()[-1])
    ref_ids = np.fromfile(tmp_path / "ref_ids.i64", dtype=np.int64).reshape(
        NQ, K
    )
    assert not np.isin(ref_ids, dead).any()  # deletes honored by the engine

    _, ids, _ = idx.search_cpu(q, k=K, ef=EF)
    overlap = np.mean(
        [len(set(ids[i]) & set(ref_ids[i])) / K for i in range(NQ)]
    )
    assert overlap > 0.99, overlap


@pytest.mark.slow
def test_real_engine_bin_import_50k(tmp_path):
    """North-star-shaped import: a real-engine-saved 50k index round-trips
    with identical neighbor lists AND vectors (round-4 verdict item 3)."""
    eng = _engine()
    n = 50_000
    x, q, gt = _dataset(n=n, seed=13)
    x.tofile(tmp_path / "data.f32")
    q.tofile(tmp_path / "q.f32")
    r = subprocess.run(
        [eng, "build_search", str(tmp_path / "data.f32"), str(n), str(DIM),
         str(M), str(EF_C), str(tmp_path / "q.f32"), str(NQ), str(K),
         str(EF), str(tmp_path / "ids.i64"), str(tmp_path / "graph.adj"),
         str(tmp_path / "index.bin")],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref_ids = np.fromfile(tmp_path / "ids.i64", dtype=np.int64).reshape(
        NQ, K
    )

    g, vectors, deleted, _ = read_bin(str(tmp_path / "index.bin"))
    np.testing.assert_array_equal(vectors, x)
    _graphs_equal(g, read_adj(str(tmp_path / "graph.adj"), max_m=M))

    idx = HNSWIndex.from_hnswlib(str(tmp_path / "index.bin"))
    _, ids, _ = idx.search_cpu(q, k=K, ef=EF)
    ours, ref = _recall(ids, gt), _recall(ref_ids, gt)
    assert abs(ours - ref) < 0.01, (ours, ref)


def test_round_trip_exact(tmp_path):
    """write_bin -> read_bin is exact: topology, vectors, labels, deletes."""
    x, q, _ = _dataset(n=1500)
    idx = HNSWIndex("l2", dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x, np.arange(10_000, 10_000 + 1500))  # non-trivial labels
    idx.mark_deleted(10_007)
    path = str(tmp_path / "rt.bin")
    idx.save_hnswlib(path)

    g, vectors, deleted, meta = read_bin(path)
    g0 = idx._builder.export_graph()
    np.testing.assert_array_equal(vectors, idx._builder.export_vectors())
    np.testing.assert_array_equal(deleted, idx._builder.export_deleted())
    assert meta["m"] == M and meta["ef_construction"] == EF_C
    _graphs_equal(g, g0)

    idx2 = HNSWIndex.from_hnswlib(path)
    d1, l1, _ = idx.search_cpu(q, k=K, ef=EF)
    d2, l2, _ = idx2.search_cpu(q, k=K, ef=EF)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


@pytest.mark.parametrize("space", ["ip", "cosine", "l2u8"])
def test_round_trip_spaces(tmp_path, space):
    """Every persist space round-trips: f32 (ip), normalized f32 (cosine),
    and the u8 / L2SpaceI layout (l2u8) whose data block is 1 byte/dim."""
    rng = np.random.default_rng(23)
    n = 800
    if space == "l2u8":
        x = rng.integers(0, 256, size=(n, DIM)).astype(np.uint8)
        q = rng.integers(0, 256, size=(64, DIM)).astype(np.uint8)
    else:
        x = rng.normal(size=(n, DIM)).astype(np.float32)
        q = rng.normal(size=(64, DIM)).astype(np.float32)
    idx = HNSWIndex(space, dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x)
    path = str(tmp_path / f"{space}.bin")
    idx.save_hnswlib(path)

    g, vectors, _, meta = read_bin(path, space=space)
    if space == "l2u8":
        assert vectors.dtype == np.uint8
        np.testing.assert_array_equal(vectors, x)
        assert meta["dim"] == DIM  # data block is dim BYTES, not dim floats
    _graphs_equal(g, idx._builder.export_graph())

    idx2 = HNSWIndex.from_hnswlib(path, space=space)
    assert idx2.space.persist_name == space
    _, l1, _ = idx.search_cpu(q, k=K, ef=EF)
    _, l2, _ = idx2.search_cpu(q, k=K, ef=EF)
    np.testing.assert_array_equal(l1, l2)


def test_corruption_rejected(tmp_path):
    """The loader reproduces loadIndex's tail scan: truncated or padded
    files are rejected (hnswalg.h:752-771)."""
    x, _, _ = _dataset(n=500)
    idx = HNSWIndex("l2", dim=DIM, m=M, ef_construction=EF_C)
    idx.add_items(x)
    path = str(tmp_path / "c.bin")
    idx.save_hnswlib(path)
    blob = open(path, "rb").read()
    for bad in (blob[:-8], blob + b"\0\0\0\0"):
        with open(path, "wb") as f:
            f.write(bad)
        with pytest.raises(ValueError):
            read_bin(path)
