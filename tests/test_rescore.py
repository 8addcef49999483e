"""Exact-rescore pass for int8-served queries (VERDICT r2 item 5): the top
candidates of a unified8-tier search are re-ranked against the
full-precision vectors, recovering the quantization recall loss."""

import numpy as np
import pytest

from hnsw_tpu.core.spaces import L2Space
from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.models.hnsw import HNSWIndex, SearchParams

DIM = 32
N = 2000


def _force_unified8(idx):
    idx.inline_neighbors = True
    idx.unified_max_bytes = 7 * 10**6  # u8 fits (~6MB), bf16 unified (~10MB) not
    idx._device = None
    idx._dirty = True
    idx._sync_device()
    assert idx._device[5][0] == "unified8", idx._device[5][0]


@pytest.mark.slow
def test_rescore_recovers_exact_distances(rng):
    x = (rng.normal(size=(N, DIM)) * 3).astype(np.float32)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=100)
    idx.add_items(x)
    _force_unified8(idx)
    q = rng.normal(size=(16, DIM)).astype(np.float32) * 3

    bf = BruteforceIndex(L2Space(DIM))
    bf.add_items(x, np.arange(N))
    d_ref, l_ref = bf.search_knn(q, 10)

    # int8 path without rescore: distances are dequantized approximations
    d_raw, l_raw = idx.search(q, k=10, ef=200, params=SearchParams(
        k=10, ef=200, rescore=0))
    # with rescore (auto on for unified8): exact f32 distances
    d_rs, l_rs = idx.search(q, k=10, ef=200)

    def recall(l):
        return np.mean([len(set(a) & set(b)) / 10 for a, b in zip(l, l_ref)])

    r_raw, r_rs = recall(l_raw), recall(l_rs)
    assert r_rs >= r_raw - 1e-9
    # rescored distances match the oracle's exactly for the common labels
    for i in range(16):
        ref = dict(zip(l_ref[i], d_ref[i]))
        for lab, dv in zip(l_rs[i], d_rs[i]):
            if lab in ref:
                np.testing.assert_allclose(dv, ref[lab], rtol=1e-5)


def test_rescore_respects_filters(rng):
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=100)
    idx.add_items(x)
    _force_unified8(idx)
    q = rng.normal(size=(16, DIM)).astype(np.float32)
    mask = rng.random(N) < 0.5
    d, l = idx.search(q, k=10, ef=200, filter_labels=mask)
    ok = l.reshape(-1) >= 0
    assert mask[l.reshape(-1)[ok]].all()


def test_gather_dist_bf16_table_pair_path(rng):
    """The bf16-table variant of gather_dist_pallas (used when the vector
    table is stored bf16 at the HBM edge, e.g. the N=4M serve config) DMAs
    aligned row PAIRS and selects by id parity — it must match the f32
    path to bf16 precision for both metrics and for odd/even ids."""
    import jax.numpy as jnp

    from hnsw_tpu.ops.pallas_gather import gather_dist_pallas

    tab = rng.normal(size=(513, 128)).astype(np.float32)  # odd N: pad path
    q = rng.normal(size=(16, 128)).astype(np.float32)
    ids = rng.integers(0, 513, size=(16, 24)).astype(np.int32)
    for space in ("l2", "ip"):
        ref = np.asarray(
            gather_dist_pallas(
                jnp.asarray(q), jnp.asarray(tab), jnp.asarray(ids),
                space=space, interpret=True,
            )
        )
        out = np.asarray(
            gather_dist_pallas(
                jnp.asarray(q), jnp.asarray(tab).astype(jnp.bfloat16),
                jnp.asarray(ids), space=space, interpret=True,
            )
        )
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.max(np.abs(out - ref)) / scale < 0.02, space
