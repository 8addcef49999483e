"""Incremental device sync (resizeIndex analog, hnswalg.h:633-683) and
allow_replace_deleted (hnswalg.h:954-961,879-921).

A mutation after the first sync must apply as row deltas — identical device
state to a from-scratch rebuild, without the full re-upload."""

import numpy as np
import pytest

from hnsw_tpu.core.graph import check_integrity
from hnsw_tpu.models.hnsw import HNSWIndex

DIM = 24


def _data(n, seed=0):
    return np.random.default_rng(seed).normal(size=(n, DIM)).astype(np.float32)


def test_insert_delta_matches_full_rebuild(rng):
    x = _data(3000)
    extra = _data(150, seed=1)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=80)
    idx.add_items(x)
    q = _data(32, seed=2)
    idx.search(q, k=5, ef=60)
    assert idx._last_sync_mode == "full"

    idx.add_items(extra, np.arange(3000, 3150))
    d1, l1 = idx.search(q, k=5, ef=60)
    assert idx._last_sync_mode == "delta", "insert should sync incrementally"

    # force a from-scratch rebuild of the same builder state; results and
    # (sentinel-normalized) device rows must be identical. n_pad differs
    # between the two paths (the delta keeps the old padding), so compare in
    # id space with out-of-range remapped to -1.
    n = idx.num_elements
    dg_delta = idx._device[0]
    lvl_delta = np.asarray(dg_delta.level0)[:n]
    lvl_delta = np.where(lvl_delta >= n, -1, lvl_delta)
    x_delta = np.asarray(idx._device[1])[:n]
    idx._device = None
    idx._dirty = True
    d2, l2 = idx.search(q, k=5, ef=60)
    assert idx._last_sync_mode == "full"
    dg_full = idx._device[0]
    lvl_full = np.asarray(dg_full.level0)[:n]
    lvl_full = np.where(lvl_full >= n, -1, lvl_full)
    np.testing.assert_array_equal(lvl_delta, lvl_full)
    np.testing.assert_allclose(x_delta, np.asarray(idx._device[1])[:n], rtol=0)
    np.testing.assert_allclose(d1, d2)
    np.testing.assert_array_equal(l1, l2)


def test_mark_deleted_skips_graph_rebuild():
    x = _data(1500)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=80)
    idx.add_items(x)
    q = x[:16]
    idx.search(q, k=3, ef=40)
    lvl0_before = idx._device[0].level0
    idx.mark_deleted(7)
    d, l = idx.search(q, k=3, ef=40)
    assert idx._last_sync_mode == "deleted"
    assert idx._device[0].level0 is lvl0_before, "graph arrays must be reused"
    assert 7 not in set(l.ravel().tolist())


def test_update_syncs_as_delta():
    x = _data(800)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=80)
    idx.add_items(x)
    idx.search(x[:16], k=3, ef=40)
    # same label, new vector -> in-place update -> row delta (the updated
    # vector row + its level-0 in-neighbors' inline rows), NOT a full resync
    # (r2 behavior; VERDICT r2 item 4)
    v = _data(1, seed=9)[0]
    idx.add_point(v, 5)
    d, l = idx.search(v[None, :], k=1, ef=40)
    assert idx._last_sync_mode == "delta"
    assert l[0, 0] == 5 and d[0, 0] < 1e-3


def test_growth_past_headroom_full_resyncs():
    x = _data(500)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=80)
    idx.growth_headroom = 0.0
    idx.add_items(x)
    idx.search(x[:16], k=3, ef=40)
    n_pad = idx._device[0].n_pad
    idx.add_items(_data(n_pad, seed=3), np.arange(500, 500 + n_pad))
    d, l = idx.search(x[:16], k=3, ef=40)
    assert idx._last_sync_mode == "full"
    assert (l[:, 0] == np.arange(16)).mean() >= 0.9


def test_replace_deleted_reuses_slots():
    x = _data(1200)
    idx = HNSWIndex(
        "l2", dim=DIM, m=8, ef_construction=100, allow_replace_deleted=True
    )
    idx.add_items(x)
    n0 = idx.num_elements
    victims = [3, 44, 555, 700, 1100]
    for lab in victims:
        idx.mark_deleted(lab)
    fresh = _data(len(victims), seed=7)
    new_labels = np.arange(5000, 5000 + len(victims))
    idx.add_items(fresh, new_labels, replace_deleted=True)
    assert idx.num_elements == n0, "replace must reuse slots, not append"
    assert idx._builder.num_deleted == 0
    check_integrity(idx.graph, require_inbound=False)
    # old labels gone, new labels findable as their own nearest neighbor
    d, l = idx.search(fresh, k=1, ef=100)
    np.testing.assert_array_equal(l[:, 0], new_labels)
    d2, l2 = idx.search(x[:64], k=10, ef=100)
    for lab in victims:
        assert lab not in set(l2.ravel().tolist())
    # recall sanity on the untouched points
    hits = np.mean(l2[:, 0] == np.arange(64))
    assert hits >= 0.85


def test_replace_deleted_requires_flag():
    idx = HNSWIndex("l2", dim=DIM, m=8)
    idx.add_items(_data(50))
    with pytest.raises(AssertionError):
        idx.add_point(_data(1)[0], 99, replace_deleted=True)


def test_replace_deleted_appends_when_none_deleted():
    idx = HNSWIndex(
        "l2", dim=DIM, m=8, ef_construction=80, allow_replace_deleted=True
    )
    idx.add_items(_data(100))
    idx.add_items(_data(3, seed=4), np.array([200, 201, 202]), replace_deleted=True)
    assert idx.num_elements == 103
    d, l = idx.search(_data(3, seed=4), k=1, ef=80)
    np.testing.assert_array_equal(l[:, 0], [200, 201, 202])


@pytest.mark.parametrize(
    "kind_budget", [("unified", None), ("unified8", "mid"), ("split", 0)]
)
def test_incremental_sync_inline_tables(rng, kind_budget):
    """Delta syncs with inline tables forced on (CPU interpret mode): the
    tagged tuple must stay well-formed across incremental updates — the
    unified tag once collapsed to a 2-tuple after a delta, crashing the
    first TPU bulk_build wave that reused it (inline_search_kwargs reads
    element 2)."""
    kind, budget = kind_budget
    x = _data(600)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=60,
                    inline_neighbors=True)
    if budget == "mid":
        # between the int8 (5-sublane) and bf16 (9-sublane) row sizes
        idx.unified_max_bytes = 7 * 512 * 640
    elif budget is not None:
        idx.unified_max_bytes = budget  # force the split layout
    idx.add_items(x)
    idx.search(x[:16], k=3, ef=40)
    assert idx._device[5][0] == kind
    idx.add_items(_data(30, seed=5), np.arange(600, 630))
    d, l = idx.search(x[:16], k=3, ef=40)
    assert idx._last_sync_mode == "delta"
    nbr_vec = idx._device[5]
    assert nbr_vec[0] == kind
    assert len(nbr_vec) == (5 if kind == "unified8" else 3)
    from hnsw_tpu.models.hnsw import inline_search_kwargs

    assert set(inline_search_kwargs(nbr_vec))  # must not raise
    assert np.mean(l[:, 0] == np.arange(16)) >= 0.9


def test_update_applies_as_row_delta():
    """In-place vector updates must sync as row deltas, not a full table
    rebuild (VERDICT r2 item 4; reference local repair: updatePoint /
    repairConnectionsForUpdate, hnswalg.h:995-1150). The delta state must be
    bit-identical to a from-scratch rebuild of the same builder."""
    x = _data(3000)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=80)
    idx.add_items(x)
    q = _data(32, seed=2)
    idx.search(q, k=5, ef=60)
    assert idx._last_sync_mode == "full"

    # update 100 existing labels with new vectors
    upd_labels = np.arange(0, 1000, 25)
    upd_vecs = _data(40, seed=7)
    idx.add_items(upd_vecs, upd_labels)
    d1, l1 = idx.search(q, k=5, ef=60)
    assert idx._last_sync_mode == "delta", "update should sync incrementally"

    from hnsw_tpu.core.graph import check_integrity

    # require_inbound=False: a re-prune during repair can orphan a node's
    # last inbound edge — true of hnswlib's updatePoint repair as well
    # (hnswalg.h:1074-1150); all other invariants must hold
    check_integrity(idx.graph, require_inbound=False)

    # delta device state must equal a from-scratch rebuild
    n = idx.num_elements
    x_delta = np.asarray(idx._device[1])[:n]
    lvl_delta = np.asarray(idx._device[0].level0)[:n]
    lvl_delta = np.where(lvl_delta >= n, -1, lvl_delta)
    idx._device = None
    idx._dirty = True
    d2, l2 = idx.search(q, k=5, ef=60)
    assert idx._last_sync_mode == "full"
    np.testing.assert_allclose(
        x_delta, np.asarray(idx._device[1])[:n], rtol=0
    )
    lvl_full = np.asarray(idx._device[0].level0)[:n]
    lvl_full = np.where(lvl_full >= n, -1, lvl_full)
    np.testing.assert_array_equal(lvl_delta, lvl_full)
    # delta-path sq-norms round differently than the full rebuild's (same
    # f32 math, different reduction grouping) — distances agree to fp noise
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
    np.testing.assert_array_equal(l1, l2)

    # recall unaffected: updated vectors are found at their new positions
    du, lu = idx.search(upd_vecs[:16], k=1, ef=80)
    assert (lu[:, 0] == upd_labels[:16]).mean() >= 0.9


@pytest.mark.parametrize("kind", ["unified", "split"])
@pytest.mark.slow
def test_delta_applies_in_bounded_slices(rng, monkeypatch, kind):
    """Large deltas apply in DELTA_CHUNK-row slices (bulk-build waves dirty
    100k+ rows; a one-shot apply's gather transients spike past the HBM edge
    at 2M). With the chunk forced tiny, the sliced path must still produce
    device state identical to a from-scratch rebuild."""
    import hnsw_tpu.models.hnsw as hnsw_mod

    monkeypatch.setattr(hnsw_mod, "DELTA_CHUNK", 64)
    x = _data(2000)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=80,
                    inline_neighbors=True)
    if kind == "split":
        idx.unified_max_bytes = 0
    idx.add_items(x)
    q = _data(32, seed=2)
    idx.search(q, k=5, ef=60)
    assert idx._device[5][0] == kind

    # 100 inserts (within growth headroom) dirty well over 64 rows ->
    # several slices
    idx.add_items(_data(100, seed=1), np.arange(2000, 2100))
    d1, l1 = idx.search(q, k=5, ef=60)
    assert idx._last_sync_mode == "delta"

    n = idx.num_elements
    x_delta = np.asarray(idx._device[1])[:n]
    lvl_delta = np.asarray(idx._device[0].level0)[:n]
    lvl_delta = np.where(lvl_delta >= n, -1, lvl_delta)
    nbr_delta = np.asarray(idx._device[5][1])
    idx._device = None
    idx._dirty = True
    d2, l2 = idx.search(q, k=5, ef=60)
    assert idx._last_sync_mode == "full"
    np.testing.assert_allclose(x_delta, np.asarray(idx._device[1])[:n], rtol=0)
    lvl_full = np.asarray(idx._device[0].level0)[:n]
    lvl_full = np.where(lvl_full >= n, -1, lvl_full)
    np.testing.assert_array_equal(lvl_delta, lvl_full)
    nbr_full = np.asarray(idx._device[5][1])
    if nbr_delta.shape == nbr_full.shape:
        np.testing.assert_array_equal(nbr_delta, nbr_full)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
    np.testing.assert_array_equal(l1, l2)


def test_replace_deleted_label_swap_syncs_as_delta():
    """insert_replace reuses a deleted slot and swaps its label — the delta
    path must propagate the new label to the device label table."""
    x = _data(1200)
    idx = HNSWIndex(
        "l2", dim=DIM, m=8, ef_construction=80, allow_replace_deleted=True
    )
    idx.add_items(x)
    idx.search(x[:8], k=1, ef=40)
    idx.mark_deleted(17)
    v_new = _data(1, seed=9)
    idx.add_point(v_new[0], 5000, replace_deleted=True)
    d, l = idx.search(v_new, k=1, ef=80)
    assert idx._last_sync_mode == "delta"
    assert l[0, 0] == 5000
    assert d[0, 0] < 1e-3
