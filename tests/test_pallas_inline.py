"""Inline neighbor-vector fast path, run in Pallas interpret mode on CPU
(the same code path compiles to the TPU Mosaic kernel)."""

import jax.numpy as jnp
import numpy as np

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
