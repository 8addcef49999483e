"""Top-k / bruteforce oracle vs NumPy (reference: hnswlib/bruteforce.h)."""

import numpy as np
import jax.numpy as jnp

from hnsw_tpu.ops.topk import topk_smallest, merge_sorted_topk, bruteforce_topk


def test_topk_smallest(rng):
    d = rng.normal(size=(5, 40)).astype(np.float32)
    dd, ii = topk_smallest(jnp.asarray(d), 7)
    dd, ii = np.asarray(dd), np.asarray(ii)
    want_i = np.argsort(d, axis=1)[:, :7]
    np.testing.assert_allclose(np.sort(dd, 1), np.take_along_axis(d, want_i, 1), rtol=1e-6)
    assert np.all(dd[:, :-1] <= dd[:, 1:])


def test_merge(rng):
    da = rng.normal(size=(3, 6)).astype(np.float32)
    db = rng.normal(size=(3, 4)).astype(np.float32)
    ia = rng.integers(0, 100, size=(3, 6)).astype(np.int32)
    ib = rng.integers(100, 200, size=(3, 4)).astype(np.int32)
    d, i = merge_sorted_topk(jnp.asarray(da), jnp.asarray(ia), jnp.asarray(db), jnp.asarray(ib), 5)
    d, i = np.asarray(d), np.asarray(i)
    alld = np.concatenate([da, db], 1)
    alli = np.concatenate([ia, ib], 1)
    for b in range(3):
        order = np.argsort(alld[b])[:5]
        np.testing.assert_allclose(d[b], alld[b][order], rtol=1e-6)
        assert set(i[b]) == set(alli[b][order])


def _check_bruteforce(q, x, k, space, **kw):
    d, i = bruteforce_topk(jnp.asarray(q), jnp.asarray(x), k, space, **kw)
    d, i = np.asarray(d), np.asarray(i)
    if space == "l2":
        full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    else:
        full = 1.0 - q @ x.T
    want_i = np.argsort(full, axis=1)[:, :k]
    want_d = np.take_along_axis(full, want_i, 1)
    np.testing.assert_allclose(d, want_d, rtol=1e-3, atol=1e-3)
    # ids must match except possibly among ties
    for b in range(q.shape[0]):
        assert set(i[b]) == set(want_i[b]), f"row {b}"


def test_bruteforce_single_chunk(rng):
    q = rng.normal(size=(8, 32)).astype(np.float32)
    x = rng.normal(size=(500, 32)).astype(np.float32)
    _check_bruteforce(q, x, 10, "l2")
    _check_bruteforce(q, x, 10, "ip")


def test_bruteforce_chunked(rng):
    q = rng.normal(size=(4, 16)).astype(np.float32)
    x = rng.normal(size=(1000, 16)).astype(np.float32)
    _check_bruteforce(q, x, 13, "l2", chunk_size=256)
    sq = jnp.sum(jnp.asarray(x) ** 2, axis=-1)
    _check_bruteforce(q, x, 13, "l2", chunk_size=256, x_sq_norms=sq)


def test_bruteforce_chunked_nondivisible(rng):
    q = rng.normal(size=(2, 8)).astype(np.float32)
    x = rng.normal(size=(777, 8)).astype(np.float32)
    _check_bruteforce(q, x, 5, "l2", chunk_size=256)
