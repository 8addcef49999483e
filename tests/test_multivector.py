"""Epsilon (range) search and multi-vector document search vs brute force
(reference semantics: hnswlib/stop_condition.h)."""

import numpy as np

from hnsw_tpu.models.hnsw import HNSWIndex
from hnsw_tpu.models.multivector import MultiVectorIndex, epsilon_search

DIM = 16


def test_epsilon_search(rng):
    n = 2000
    x = rng.normal(size=(n, DIM)).astype(np.float32)
    idx = HNSWIndex("l2", dim=DIM, m=16, ef_construction=100)
    idx.add_items(x)
    q = x[:8]
    eps = 8.0
    d, l, valid = epsilon_search(idx, q, epsilon=eps, min_candidates=3, max_candidates=32)
    # ground truth per query
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    for i in range(8):
        got = set(l[i][valid[i]])
        true_within = set(np.where(full[i] <= eps)[0])
        if len(true_within) <= 32:
            # all within-eps points beyond min_candidates must be found
            # (beam search is approximate; demand high overlap)
            overlap = len(got & true_within) / max(len(true_within), 1)
            assert overlap >= 0.9, (i, overlap)
        # every reported point beyond min_candidates is truly within eps
        ranked = np.where(valid[i])[0]
        for j in ranked[3:]:
            assert d[i, j] <= eps + 1e-4
        # min_candidates honored even if eps tiny
    d2, l2, v2 = epsilon_search(idx, q, epsilon=1e-9, min_candidates=3, max_candidates=16)
    assert np.all(v2[:, :3])
    assert np.all(v2.sum(axis=1) == 3)


def test_multivector_doc_search(rng):
    n_docs, vecs_per_doc = 100, 5
    centers = 10.0 * rng.normal(size=(n_docs, DIM)).astype(np.float32)
    mv = MultiVectorIndex("l2", dim=DIM, m=16, ef_construction=100)
    all_vecs = {}
    for doc in range(n_docs):
        vs = centers[doc] + rng.normal(size=(vecs_per_doc, DIM)).astype(np.float32)
        all_vecs[doc] = vs
        mv.add_document(doc, vs)
    assert mv.num_docs == n_docs

    q = centers[:16].astype(np.float32)
    dd, docs = mv.search(q, k_docs=5, oversample=6)
    # top doc for query at center[i] must be doc i
    assert np.mean(docs[:, 0] == np.arange(16)) >= 0.95
    # doc list has no duplicates
    for i in range(16):
        real = docs[i][docs[i] >= 0]
        assert len(set(real)) == len(real)
    # distances ascending
    assert np.all(np.diff(dd, axis=1) >= -1e-6)


def test_multivector_doc_dist_is_min_over_vectors(rng):
    mv = MultiVectorIndex("l2", dim=DIM, m=8, ef_construction=64)
    vs = rng.normal(size=(4, DIM)).astype(np.float32)
    mv.add_document(7, vs)
    mv.add_document(8, vs + 100.0)
    q = vs[2:3]
    dd, docs = mv.search(q, k_docs=2, oversample=4)
    assert docs[0, 0] == 7
    assert dd[0, 0] < 1e-3  # min over doc-7's vectors (exact hit on vs[2])
