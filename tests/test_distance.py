"""Distance kernels vs NumPy ground truth (reference scalar semantics:
hnswlib/space_l2.h:7-24, hnswlib/space_ip.h:7-23)."""

import numpy as np
import jax.numpy as jnp

from hnsw_tpu.ops.distance import (
    pairwise_l2_sq,
    pairwise_ip_dist,
    gather_l2_sq,
    gather_ip_dist,
    dist_one,
)


def np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def np_ip(q, x):
    return 1.0 - q @ x.T


def test_pairwise_l2(rng):
    q = rng.normal(size=(7, 33)).astype(np.float32)
    x = rng.normal(size=(19, 33)).astype(np.float32)
    got = np.asarray(pairwise_l2_sq(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_allclose(got, np_l2(q, x), rtol=1e-4, atol=1e-4)


def test_pairwise_l2_with_precomputed_norms(rng):
    q = rng.normal(size=(4, 64)).astype(np.float32)
    x = rng.normal(size=(31, 64)).astype(np.float32)
    sq = jnp.sum(jnp.asarray(x) ** 2, axis=-1)
    got = np.asarray(pairwise_l2_sq(jnp.asarray(q), jnp.asarray(x), x_sq_norms=sq))
    np.testing.assert_allclose(got, np_l2(q, x), rtol=1e-4, atol=1e-4)


def test_pairwise_ip(rng):
    q = rng.normal(size=(5, 48)).astype(np.float32)
    x = rng.normal(size=(23, 48)).astype(np.float32)
    got = np.asarray(pairwise_ip_dist(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_allclose(got, np_ip(q, x), rtol=1e-4, atol=1e-4)


def test_gather_l2(rng):
    q = rng.normal(size=(6, 16)).astype(np.float32)
    x = rng.normal(size=(40, 16)).astype(np.float32)
    ids = rng.integers(0, 40, size=(6, 9)).astype(np.int32)
    got = np.asarray(gather_l2_sq(jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids)))
    want = np.stack([np_l2(q[b : b + 1], x[ids[b]])[0] for b in range(6)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gather_l2_with_norms(rng):
    q = rng.normal(size=(3, 16)).astype(np.float32)
    x = rng.normal(size=(20, 16)).astype(np.float32)
    sq = jnp.sum(jnp.asarray(x) ** 2, axis=-1)
    ids = rng.integers(0, 20, size=(3, 5)).astype(np.int32)
    got = np.asarray(
        gather_l2_sq(jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids), x_sq_norms=sq)
    )
    want = np.stack([np_l2(q[b : b + 1], x[ids[b]])[0] for b in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gather_ip(rng):
    q = rng.normal(size=(4, 24)).astype(np.float32)
    x = rng.normal(size=(30, 24)).astype(np.float32)
    ids = rng.integers(0, 30, size=(4, 7)).astype(np.int32)
    got = np.asarray(gather_ip_dist(jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids)))
    want = np.stack([np_ip(q[b : b + 1], x[ids[b]])[0] for b in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dist_one_scalar_parity(rng):
    a = rng.normal(size=17).astype(np.float32)
    b = rng.normal(size=17).astype(np.float32)
    assert abs(float(dist_one(jnp.asarray(a), jnp.asarray(b), "l2")) - ((a - b) ** 2).sum()) < 1e-3
    assert abs(float(dist_one(jnp.asarray(a), jnp.asarray(b), "ip")) - (1 - a @ b)) < 1e-4
