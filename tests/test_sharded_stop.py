"""Sharded parity for the pluggable stop condition, epsilon (range) search
and multi-vector document retrieval (VERDICT r3 item 8): the widening
searches in models/multivector.py take any index exposing the
`.search(q, k=, ef=)` surface, so a ShardedHNSWIndex drops in; `stop_fn`
threads through sharded_search into every shard-local beam."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hnsw_tpu.core.spaces import L2Space
from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.models.hnsw import HNSWIndex
from hnsw_tpu.models.multivector import MultiVectorIndex, epsilon_search
from hnsw_tpu.parallel.sharding import ShardedHNSWIndex

N, DIM = 3000, 32


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(41)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    q = x[rng.integers(0, N, 32)] + 0.01 * rng.normal(size=(32, DIM)).astype(
        np.float32
    )
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    sidx = ShardedHNSWIndex("l2", DIM, mesh=mesh, m=8, ef_construction=100)
    sidx.build(x, np.arange(N))
    return x, q, sidx


def _stop_after_5(view):
    return jnp.broadcast_to(view.it >= 5, view.beam_d.shape[:1])


def test_sharded_stop_fn(setup):
    x, q, sidx = setup
    d0, l0 = sidx.search(q, k=10, ef=100)
    d1, l1 = sidx.search(q, k=10, ef=100, stop_fn=_stop_after_5)
    assert np.isfinite(d1).all()
    # the early stop is a valid prefix: recall degraded at most mildly on
    # this easy self-query set
    match0 = np.mean(l0[:, 0] == l1[:, 0])
    assert match0 >= 0.9


def test_sharded_epsilon_parity(setup):
    x, q, sidx = setup
    # exact within-epsilon sets from the oracle
    d_full = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    eps = float(np.percentile(d_full.min(axis=1), 90) * 4)

    d, l, valid = epsilon_search(
        sidx, q, epsilon=eps, min_candidates=2, max_candidates=32
    )
    assert d.shape == (32, 32) and valid.shape == (32, 32)
    # every valid point is within eps or among the 2 closest returned
    within = d <= eps
    rank = np.arange(32)[None, :]
    assert np.all(~valid | within | (rank < 2))
    # high overlap with the exact within-eps set (capped at 32)
    hits, total = 0, 0
    for i in range(32):
        exact = set(np.where(d_full[i] <= eps)[0][:32])
        got = set(l[i][valid[i]]) & set(range(N))
        if exact:
            inter = len(got & exact)
            hits += inter
            total += min(len(exact), 32)
    assert total > 0 and hits / total >= 0.9, (hits, total)


def test_sharded_multivector_matches_single_chip(setup):
    x, q, sidx_unused = setup
    rng = np.random.default_rng(5)
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    sharded = MultiVectorIndex(
        "l2", DIM,
        index=ShardedHNSWIndex("l2", DIM, mesh=mesh, m=8,
                               ef_construction=100),
    )
    single = MultiVectorIndex("l2", DIM, m=8, ef_construction=100)
    n_docs, per_doc = 150, 5
    for doc in range(n_docs):
        vecs = x[doc * per_doc : (doc + 1) * per_doc]
        # sharded build path wants one bulk add; its index builds on build()
        single.add_document(doc, vecs)
    # sharded index: build once over all vectors with the same labels
    all_vecs = x[: n_docs * per_doc]
    sharded._doc_arr = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)
    sharded._docs = set(range(n_docs))
    sharded._next_label = n_docs * per_doc
    sharded.index.build(all_vecs, np.arange(n_docs * per_doc))

    dd_s, di_s = sharded.search(q, k_docs=5)
    dd_1, di_1 = single.search(q, k_docs=5)
    # same documents in the top-5 for the overwhelming majority of queries
    overlap = np.mean(
        [len(set(di_s[i]) & set(di_1[i])) / 5 for i in range(len(q))]
    )
    assert overlap >= 0.9, overlap
    # returned doc scores are true closest-vector distances: equal to the
    # exact per-doc min for ~all entries (both engines are approximate, so
    # allow a small miss rate), never below it
    d_all = ((q[:, None, :] - all_vecs[None]) ** 2).sum(-1)
    exact_doc_min = d_all.reshape(len(q), n_docs, per_doc).min(-1)
    good, count = 0, 0
    for i in range(len(q)):
        for doc, dist in zip(di_s[i], dd_s[i]):
            if doc < 0:
                continue
            ref = exact_doc_min[i, doc]
            assert dist >= ref - 1e-4
            good += abs(dist - ref) <= 1e-3 * max(ref, 1e-6)
            count += 1
    assert count > 0 and good / count >= 0.95, (good, count)
