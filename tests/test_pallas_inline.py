"""Inline neighbor-vector fast path, run in Pallas interpret mode on CPU
(the same code path compiles to the TPU Mosaic kernel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnsw_tpu.core.graph import graph_device_arrays, pad_vectors, round_up
from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.core.spaces import L2Space
from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder
from hnsw_tpu.ops.pallas_gather import (
    extract_level0_ids,
    hop_dist_inline,
    make_inline_neighbors,
    make_level0_tiles,
)
from hnsw_tpu.ops.distance import gather_l2_sq
from hnsw_tpu.ops.traversal import search_batch


def test_hop_dist_inline_interpret(rng):
    n, d, b, m0 = 300, 128, 16, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    level0 = rng.integers(0, n, size=(n, m0)).astype(np.int32)
    q = jnp.asarray(x[:b])
    nbrv = make_inline_neighbors(jnp.asarray(x), jnp.asarray(level0))
    l0t = make_level0_tiles(jnp.asarray(level0))
    chosen = jnp.asarray(rng.integers(0, n, size=(b, 2)).astype(np.int32))
    got, tiles = hop_dist_inline(q, nbrv, l0t, chosen, m0, "l2", interpret=True)
    ids = jnp.take(jnp.asarray(level0), chosen, axis=0).reshape(b, 2 * m0)
    # id-tile extraction must reproduce the adjacency rows exactly
    got_ids = extract_level0_ids(tiles, chosen, m0)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(ids))
    want = gather_l2_sq(q, jnp.asarray(x), ids)
    # bf16 storage + expanded-form cancellation: abs error scales with
    # ||q||^2 (~d), not with the (possibly tiny) distance itself.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=0.5
    )


def test_hop_dist_inline_ip_interpret(rng):
    n, d, b, m0 = 200, 128, 16, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    level0 = rng.integers(0, n, size=(n, m0)).astype(np.int32)
    q = jnp.asarray(x[:b])
    nbrv = make_inline_neighbors(jnp.asarray(x), jnp.asarray(level0))
    l0t = make_level0_tiles(jnp.asarray(level0))
    chosen = jnp.asarray(rng.integers(0, n, size=(b, 1)).astype(np.int32))
    got = np.asarray(
        hop_dist_inline(q, nbrv, l0t, chosen, m0, "ip", interpret=True)[0]
    )
    ids = np.take(level0, np.asarray(chosen), axis=0).reshape(b, m0)
    want = 1.0 - np.einsum("bd,bkd->bk", x[:b], x[ids])
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=0.1)  # bf16 inputs


def test_search_inline_interpret_recall(rng):
    """End-to-end beam search via the inline kernel (interpret) matches the
    standard gather path."""
    n, dim = 1000, 32
    x = rng.normal(size=(n, dim)).astype(np.float32)
    b = NativeHNSWBuilder(dim=dim, space="l2", m=8, ef_construction=100)
    b.add_batch(x, np.arange(n))
    g = b.export_graph()
    n_pad = round_up(n + 1, 128)
    dg = graph_device_arrays(g, n_pad)
    xv = jnp.asarray(pad_vectors(x, n_pad))
    nbrv = make_inline_neighbors(xv, dg.level0)
    l0t = make_level0_tiles(dg.level0)
    q = jnp.asarray(x[:16])
    res_inline = search_batch(
        xv, dg, q, k=5, ef=32, space="l2", nbr_vectors=nbrv, level0_tiles=l0t,
        interpret=True,
    )
    res_plain = search_batch(xv, dg, q, k=5, ef=32, space="l2")
    ids_i = np.asarray(res_inline.ids)
    ids_p = np.asarray(res_plain.ids)
    # same graph, same beam: results should agree almost everywhere
    # (bf16 distance rounding can flip near-ties)
    agree = np.mean([len(set(ids_i[i]) & set(ids_p[i])) / 5 for i in range(16)])
    assert agree >= 0.9, agree
    assert np.mean(ids_i[:, 0] == np.arange(16)) >= 0.9


def test_make_inline_neighbors_chunked_parity(rng):
    """Chunked (donated-accumulator) build must equal the single-shot table."""
    import jax.numpy as jnp

    from hnsw_tpu.ops.pallas_gather import (
        make_inline_neighbors,
        make_inline_neighbors_chunked,
    )

    x = jnp.asarray(rng.normal(size=(512, 96)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, 511, size=(512, 8)).astype(np.int32))
    a = make_inline_neighbors(x, lvl)
    b = make_inline_neighbors_chunked(x, lvl, chunk=100)  # uneven tail
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unified8_kernel_parity(rng):
    """int8 unified rows: hop distances must match the dequantized math."""
    import jax.numpy as jnp

    from hnsw_tpu.ops.pallas_gather import (
        hop_dist_unified,
        make_unified8_table_chunked,
        quantize_int8,
    )

    n, d, m0 = 512, 128, 32
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, n - 1, size=(n, m0)).astype(np.int32))
    tab, codes, scales = make_unified8_table_chunked(x, lvl, chunk=200)
    q = jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
    chosen = jnp.asarray(rng.integers(0, n - 1, size=(16, 2)).astype(np.int32))
    dists, ids = hop_dist_unified(
        q, tab, chosen, m0, "l2", interpret=True, int8=True
    )
    ids_ref = np.asarray(lvl)[np.asarray(chosen)]  # [16, 2, m0]
    np.testing.assert_array_equal(
        np.asarray(ids).reshape(16, 2, m0), ids_ref
    )
    deq = np.asarray(codes).astype(np.float32) * np.asarray(scales)[:, None]
    rows = deq[ids_ref]  # [16, 2, m0, d]
    d_ref = ((np.asarray(q)[:, None, None, :] - rows) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.asarray(dists).reshape(16, 2, m0), d_ref, rtol=1e-4, atol=1e-3
    )


@pytest.mark.slow
def test_unified8_search_end_to_end(rng):
    """Force the int8 tier via a budget between the int8 and bf16 table
    sizes; search quality must match the bf16 path closely."""
    from hnsw_tpu.models.hnsw import HNSWIndex

    x = rng.normal(size=(2000, 128)).astype(np.float32)
    idx = HNSWIndex("l2", dim=128, m=16, ef_construction=100,
                    inline_neighbors=True)
    idx.add_items(x)
    # bf16 rows: 17 sublanes; int8: 9 — pick a budget between
    n_pad = ((2000 + 1 + 125) // 128 + 1) * 128
    idx.unified_max_bytes = 13 * 512 * n_pad
    q = x[:64] + 0.01 * rng.normal(size=(64, 128)).astype(np.float32)
    d8, l8 = idx.search(q, k=10, ef=100)
    assert idx._device[5][0] == "unified8", idx._device[5][0]

    idx.rebuild_device_tables(unified_max_bytes=10 * 2**30)
    assert idx._device[5][0] == "unified"
    d16, l16 = idx.search(q, k=10, ef=100)
    overlap = np.mean([
        len(set(l8[i]) & set(l16[i])) / 10 for i in range(64)
    ])
    assert overlap >= 0.95, overlap
    assert np.mean(l8[:, 0] == np.arange(64)) >= 0.95


def test_unified4_kernel_parity(rng):
    """int4 unified rows: hop distances must match the dequantized math
    (nibble pack/unpack round trip + per-neighbor scales)."""
    import jax.numpy as jnp

    from hnsw_tpu.ops.pallas_gather import (
        hop_dist_unified,
        make_unified4_table_chunked,
    )

    n, d, m0 = 512, 128, 32
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, n - 1, size=(n, m0)).astype(np.int32))
    tab, codes, scales = make_unified4_table_chunked(x, lvl, chunk=200)
    assert np.abs(np.asarray(codes)).max() <= 7
    q = jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
    chosen = jnp.asarray(rng.integers(0, n - 1, size=(16, 2)).astype(np.int32))
    dists, ids = hop_dist_unified(
        q, tab, chosen, m0, "l2", interpret=True, int4=True
    )
    ids_ref = np.asarray(lvl)[np.asarray(chosen)]  # [16, 2, m0]
    np.testing.assert_array_equal(
        np.asarray(ids).reshape(16, 2, m0), ids_ref
    )
    deq = np.asarray(codes).astype(np.float32) * np.asarray(scales)[:, None]
    rows = deq[ids_ref]  # [16, 2, m0, d]
    d_ref = ((np.asarray(q)[:, None, None, :] - rows) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.asarray(dists).reshape(16, 2, m0), d_ref, rtol=1e-4, atol=1e-3
    )


def test_unified4_search_end_to_end(rng):
    """Force the int4 tier via a budget between the int4 and int8 table
    footprints; with the auto exact-rescore pass the search quality must
    stay close to the bf16 path."""
    from hnsw_tpu.models.hnsw import HNSWIndex

    # clustered data (the documented int4-tier workload): on IID gaussian —
    # the ANN worst case where all pairwise distances concentrate — 4-bit
    # navigation noise costs ~15% overlap even with rescore
    centers = rng.normal(size=(64, 128)).astype(np.float32)
    x = centers[rng.integers(0, 64, 2000)] + 0.3 * rng.normal(
        size=(2000, 128)
    ).astype(np.float32)
    idx = HNSWIndex("l2", dim=128, m=16, ef_construction=100,
                    inline_neighbors=True)
    idx.add_items(x)
    # int8 rows: 9 sublanes + side tables (~4740 B/node); int4: 5 sublanes
    # + sides (~2692) — pick a budget between
    n_pad = ((2000 + 1 + 125) // 128 + 1) * 128
    idx.unified_max_bytes = 3500 * n_pad
    q = x[:64] + 0.01 * rng.normal(size=(64, 128)).astype(np.float32)
    d4, l4 = idx.search(q, k=10, ef=100)
    assert idx._device[5][0] == "unified4", idx._device[5][0]

    idx.rebuild_device_tables(unified_max_bytes=10 * 2**30)
    assert idx._device[5][0] == "unified"
    d16, l16 = idx.search(q, k=10, ef=100)
    overlap = np.mean([
        len(set(l4[i]) & set(l16[i])) / 10 for i in range(64)
    ])
    assert overlap >= 0.9, overlap
    assert np.mean(l4[:, 0] == np.arange(64)) >= 0.95
    # rescored distances are exact f32, not dequantized approximations:
    # top-1 distance must equal the true query->vector distance
    true_d = ((q - x[:64]) ** 2).sum(-1)
    hit = l4[:, 0] == np.arange(64)
    # (atol 1e-4 >> kernel accumulation-order noise ~6e-5 but far below the
    # ~0.05+ error of raw int4-dequantized distances)
    np.testing.assert_allclose(d4[hit, 0], true_d[hit], rtol=1e-2, atol=1e-4)
