"""HNSWIndex — the user-facing index: host builder + device traversal.

Covers the capability surface of hnswlib::HierarchicalNSW
(hnswlib/hnswalg.h:17-1411): add/update points, delete-mark/unmark, knn query
with per-call ef, filtered query, save/load — with construction on the native
host engine and queries running batched on TPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import functools

from hnsw_tpu.core.graph import (
    DeviceGraph,
    HNSWGraph,
    graph_device_arrays,
    pad_vectors,
    round_up,
    upper_host_arrays,
)
from hnsw_tpu.core.spaces import Space, get_space
from hnsw_tpu.ops.traversal import SearchResults, search_batch


# Unified node-block tables above this budget fall back to the split
# layout. 13GiB serves a 1M x d=128 x M=16 index from a 16GiB v5e (measured
# 13.98GiB live, +57% qps over split at ef=200). Builders that churn large
# row deltas (bulk_build waves) clamp to UNIFIED_WAVE_MAX_BYTES.
UNIFIED_MAX_BYTES = 13 * 2**30
# Build waves always use the split layout: its row-delta refresh is a plain
# bf16 gather+scatter (measured 0.1-3.6s/wave at 1M), while unified rows
# update via per-node dynamic slices / full rebuilds that dominate wave time.
# Serving upgrades to unified via rebuild_device_tables().
UNIFIED_WAVE_MAX_BYTES = 0
# The split bf16 table is the wave workhorse; above this it cannot fit HBM
# (N=2M: 15.3GB) and the sync falls through to the XLA-gather path.
SPLIT_MAX_BYTES = 13 * 2**30
# Row-delta applications run in slices of this many dirty rows: a bulk-build
# wave can dirty 100k+ rows, and one shot's pack/gather transients spike
# past the HBM edge when a 10GB+ unified table is live.
DELTA_CHUNK = 1 << 15


def _bucket(k: int) -> int:
    """Round a delta size up to a power-of-two bucket so the jitted
    delta-apply program compiles for O(log) distinct shapes, not one per
    insert size."""
    if k <= 0:
        return 0
    return max(256, 1 << (k - 1).bit_length())


@functools.partial(
    jax.jit,
    static_argnames=("inline_kind", "has_sq", "exact_i8"),
    donate_argnums=(0, 1, 2, 3, 4, 5, 6),
)
def _apply_row_deltas(
    x,  # [N_pad, D] vector table (donated)
    sq,  # [N_pad] sq norms or dummy (donated)
    level0,  # [N_pad, m0_pad] (donated)
    nbr_vec,  # inline table / unified node-block table / dummy (donated)
    l0_tiles,  # tiled adjacency or dummy (donated)
    codes,  # [N_pad, d_pad] int8 quantized vectors or dummy (donated)
    scales,  # [N_pad] f32 dequant scales or dummy (donated)
    new_vecs,  # [Nb, D] appended vectors (zero-padded bucket)
    new_ids,  # [Nb] int32 destination rows (sentinel-padded)
    dirty_ids,  # [Kb] int32 (sentinel-padded bucket)
    dirty_rows,  # [Kb, m0_pad] int32 (sentinel-padded)
    *,
    inline_kind: str,  # "off" | "split" | "unified" | "unified8" | "unified4"
    has_sq: bool,
    exact_i8: bool = False,  # unified8 codes are lossless scale-1 (L2SpaceU8)
):
    """Apply insert deltas to the device-resident index in place: append new
    vectors, scatter changed level-0 rows, refresh the affected inline
    neighbor-vector rows and the tiled adjacency. The padding sentinel row
    (n_pad-1) absorbs bucket-padding writes harmlessly (it stays all-sentinel
    links / zero vectors / zero sq-norm). Replaces the full re-upload the
    round-1 design did on any mutation (reference analog: resizeIndex +
    incremental addPoint, hnswalg.h:633-683,954-1267)."""
    if new_vecs.shape[0]:
        x = x.at[new_ids].set(new_vecs.astype(x.dtype))
        if has_sq:
            nsq = jnp.sum(new_vecs.astype(jnp.float32) ** 2, axis=-1)
            sq = sq.at[new_ids].set(nsq)
        if inline_kind in ("unified8", "unified4"):
            from hnsw_tpu.ops.pallas_gather import (
                quantize_exact_i8,
                quantize_int4,
                quantize_int8,
            )

            if inline_kind == "unified4":
                quant = quantize_int4
            elif exact_i8:
                quant = quantize_exact_i8
            else:
                quant = quantize_int8
            ncodes, nscales = quant(new_vecs)
            d_pad8 = codes.shape[1]
            if d_pad8 != ncodes.shape[1]:
                ncodes = jnp.pad(
                    ncodes, ((0, 0), (0, d_pad8 - ncodes.shape[1]))
                )
            codes = codes.at[new_ids].set(ncodes)
            scales = scales.at[new_ids].set(nscales)
    if dirty_ids.shape[0]:
        level0 = level0.at[dirty_ids].set(dirty_rows)
        if inline_kind in ("unified8", "unified4"):
            from hnsw_tpu.ops.pallas_gather import (
                pack_unified4_rows,
                pack_unified8_rows,
            )

            pack = (
                pack_unified4_rows
                if inline_kind == "unified4"
                else pack_unified8_rows
            )
            sent = level0.shape[0] - 1
            rows8 = pack(codes, scales, dirty_rows, sent)
            s8 = rows8.shape[1]
            # one flat row scatter (K*s8 128-lane rows, ~100ns each
            # serialized) — the round-2 fori_loop of dynamic_update_slices
            # serialized per DIRTY NODE with full-table dataflow between
            # steps and dominated wave time, which is why waves could not
            # use unified tiers
            flat = (
                dirty_ids[:, None] * s8 + jnp.arange(s8, dtype=jnp.int32)
            ).reshape(-1)
            nbr_vec = nbr_vec.at[flat].set(rows8.reshape(-1, 128))
        elif inline_kind == "unified":
            from hnsw_tpu.ops.pallas_gather import pack_unified_rows

            sent = level0.shape[0] - 1
            rows_u = pack_unified_rows(x, dirty_rows, sent)  # [K, s_data, 128]
            s_data = rows_u.shape[1]
            flat = (
                dirty_ids[:, None] * s_data
                + jnp.arange(s_data, dtype=jnp.int32)
            ).reshape(-1)
            nbr_vec = nbr_vec.at[flat].set(rows_u.reshape(-1, 128))
        elif inline_kind == "split":
            from hnsw_tpu.ops.pallas_gather import make_level0_tiles

            l0_tiles = make_level0_tiles(level0)
            d_pad = nbr_vec.shape[-1]
            # cast-then-gather (a f32 gather temp is 2x the delta size)
            rows_v = jnp.take(
                x.astype(nbr_vec.dtype), dirty_rows.reshape(-1), axis=0
            )
            if d_pad != rows_v.shape[-1]:
                rows_v = jnp.pad(rows_v, ((0, 0), (0, d_pad - rows_v.shape[-1])))
            nbr_vec = nbr_vec.at[dirty_ids].set(
                rows_v.reshape(dirty_ids.shape[0], -1, d_pad)
            )
    return x, sq, level0, nbr_vec, l0_tiles, codes, scales


@functools.partial(
    jax.jit, static_argnames=("k", "m", "space", "interpret")
)
def _rescore_topk(q, x, ids, dists, *, k, m, space, interpret):
    """Re-rank the first m beam candidates with exact distances from the
    full-precision vector table, return the best k. One Pallas row-gather
    (concurrent DMAs) + a top-k — the quantization analog of the
    storage/compute split's exactness recovery."""
    from hnsw_tpu.ops.pallas_gather import gather_dist_pallas
    from hnsw_tpu.ops.topk import topk_smallest

    idm = ids[:, :m]
    safe = jnp.clip(idm, 0, x.shape[0] - 1)
    d_ex = gather_dist_pallas(q, x, safe, space=space, interpret=interpret)
    d_ex = jnp.where(jnp.isfinite(dists[:, :m]), d_ex, jnp.inf)
    dk, pos = topk_smallest(d_ex, k)
    idk = jnp.take_along_axis(idm, pos, axis=-1)
    return dk, idk


def landmark_arrays(dg, x, sq, pool_extra: int = 0):
    """(vectors, ids, sq_norms) of every upper-level node — the graph's own
    1/M sample of the dataset, used as the landmark set of the seeded entry
    mode (SearchParams.entry_seeds). None when the graph has no upper
    levels.

    `pool_extra` > 0 enlarges the pool with that many deterministically
    strided level-0 node ids (evenly spaced over insertion order, skipping
    nodes already in the upper set). The seed matmul is MXU-bound and its
    table read amortizes over the whole query batch, so a several-x larger
    pool is nearly free while starting the beam strictly closer — which is
    what shortens the lockstep last-improvement tail that sets batch time.
    """
    if dg.max_level == 0:
        return None
    u_pad = dg.upper.shape[1]
    slot0 = np.asarray(dg.upper_slot[0])
    ids = np.where(slot0 < u_pad - 1)[0].astype(np.int32)
    if not len(ids):
        return None
    if pool_extra > 0:
        n = int(dg.num_nodes)
        mask = np.ones(n, dtype=bool)
        mask[ids[ids < n]] = False
        cand = np.nonzero(mask)[0]
        want = min(pool_extra, len(cand))
        if want > 0:
            sel = cand[
                np.linspace(0, len(cand) - 1, want).astype(np.int64)
            ]
            ids = np.concatenate([ids, sel.astype(np.int32)])
    li = jnp.asarray(ids)
    lv = jnp.take(x, li, axis=0)
    lsq = None if sq is None else jnp.take(sq, li, axis=0)
    return lv, li, lsq


def inline_search_kwargs(nbr_vec) -> dict:
    """search_batch kwargs for a tagged inline-table tuple:
    ("unified", table, upper_tables) | ("unified8", table, upper_tables) |
    ("split", nbr_vectors, level0_tiles) | None."""
    if nbr_vec is None:
        return {}
    if nbr_vec[0] == "unified":
        return {"unified_table": nbr_vec[1], "upper_tables": nbr_vec[2] or None}
    if nbr_vec[0] == "unified8":
        return {
            "unified_table": nbr_vec[1],
            "upper_tables": nbr_vec[2] or None,
            "unified_int8": True,
        }
    if nbr_vec[0] == "unified4":
        return {
            "unified_table": nbr_vec[1],
            "upper_tables": nbr_vec[2] or None,
            "unified_int4": True,
        }
    return {"nbr_vectors": nbr_vec[1], "level0_tiles": nbr_vec[2]}


@dataclasses.dataclass
class SearchParams:
    k: int = 10
    ef: int = 200
    expand: int = 1  # beam entries expanded per traversal step
    max_iters: int = 0  # 0 => 2*ef + 16
    collect_metrics: bool = False
    # Adaptive-termination speed mode: stop a query once its top-k has not
    # improved for this many iterations (0 = off; the loop then runs to beam
    # exhaustion, the searchBaseLayerST analog). The hop kernel is
    # descriptor-issue bound, so fewer expansions is the remaining qps lever.
    stop_patience: int = 0
    # >0: stop a query once its best unexpanded beam entry is farther than
    # this multiple of its frontier-reference distance (the reference's
    # lower_bound-vs-candidate cut, hnswalg.h:342-436, relaxed by a factor).
    stop_frontier: float = 0.0
    # Beam rank the frontier compares against: 0 => k (the aggressive
    # speed-mode cut), ef => hnswlib's own lower bound (the worst of the
    # ef-sized result heap) — the cut then loosens as the beam widens,
    # keeping ef a recall lever in the high-recall modes.
    frontier_rank: int = 0
    # Exact re-rank of the top-`rescore` candidates against the full-precision
    # vectors after an int8-served search (buys back the ~0.5% int8 recall
    # loss at a few % qps). None = auto: 4*k on the unified8 tier, 0 off.
    rescore: int | None = None
    # Custom pluggable stop condition (BaseSearchStopCondition analog,
    # hnswlib/hnswlib.h:134-150): StopView -> [B] bool, OR-ed with the
    # patience rule. Must be a hashable (module-level) callable.
    stop_fn: object = None
    # >0: landmark-seeded entry — ONE MXU matmul against all upper-level
    # nodes (the natural 1/M landmark sample) replaces the greedy descent,
    # and the beam starts at the best `entry_seeds` landmarks. The matmul
    # is an EXACT argmin over the landmark set where the descent is
    # approximate, and a multi-seed start shortens the level-0
    # last-improvement tail that sets the lockstep batch time.
    entry_seeds: int = 0
    # >0 (with entry_seeds): add this many strided level-0 nodes to the
    # landmark pool beyond the upper-level set. The seed matmul's cost is
    # amortized over the batch, so a larger pool buys a closer beam start
    # (and thus a lower viable hop budget) almost for free.
    seed_pool: int = 0


class HNSWIndex:
    """TPU-resident HNSW index with a native host-side builder."""

    def __init__(
        self,
        space: Space | str,
        dim: int | None = None,
        m: int = 16,
        ef_construction: int = 200,
        seed: int = 123,
        inline_neighbors: bool | None = None,
        allow_replace_deleted: bool = False,
        growth_headroom: float = 1 / 16,
    ):
        if isinstance(space, str):
            assert dim is not None, "dim required when space given by name"
            space = get_space(space, dim)
        self.space = space
        self.dim = space.dim
        self.m = m
        self.ef_construction = ef_construction
        self.allow_replace_deleted = allow_replace_deleted
        # Device arrays are padded past the current size by this fraction so
        # small inserts apply as row deltas instead of a full re-upload (the
        # resizeIndex analog, hnswalg.h:633-683; amortized like std::vector).
        self.growth_headroom = growth_headroom
        # Inline neighbor-vector table (fast traversal path): one contiguous
        # DMA per hop instead of maxM0 random row reads. Costs maxM0 x extra
        # HBM for (bf16) vectors; default on for TPU backends.
        if inline_neighbors is None:
            inline_neighbors = jax.default_backend() == "tpu"
        if inline_neighbors and 2 * m > 128:
            # unified node-block rows carry up to 128 ids per id sublane;
            # beyond that fall back to the XLA gather path rather than
            # assert — the reference allows any M.
            inline_neighbors = False
        self.inline_neighbors = inline_neighbors
        # Unified rows cost ~1.5x the split inline table; above this budget
        # fall back to the split design (or gathers when maxM0 > 32).
        self.unified_max_bytes = UNIFIED_MAX_BYTES
        # False drops the per-level unified descent tables (~1.2GB at 2M):
        # bulk-build waves at the HBM edge use the gather descent instead.
        self.upper_inline = True
        # False drops the int8/int4 codes/scales side tables after the
        # unified table is packed (serve-only indexes; ~0.54GB at 4M).
        # Row deltas then fall back to a full resync.
        self.keep_delta_tables = True
        from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder

        self._builder = NativeHNSWBuilder(
            self.dim, space.name, m, ef_construction, seed
        )
        self._device = None  # (DeviceGraph, vectors, sq_norms, deleted_mask, labels_np)
        self._dirty = True
        self._dirty_deleted = False
        self._synced_n = 0

    # -- construction --------------------------------------------------------

    def add_items(
        self,
        data: np.ndarray,
        labels: np.ndarray | None = None,
        replace_deleted: bool = False,
    ) -> None:
        data = self.space.preprocess(data)
        if labels is None:
            start = self._builder.size
            labels = np.arange(start, start + data.shape[0], dtype=np.int64)
        labels = np.asarray(labels, dtype=np.int64)
        if replace_deleted:
            assert self.allow_replace_deleted, (
                "index built with allow_replace_deleted=False"
            )
            for row, lab in zip(data, labels.reshape(-1)):
                self._builder.add_replace(row, int(lab))
        else:
            self._builder.add_batch(data, labels)
        self._dirty = True

    def add_point(
        self, vec: np.ndarray, label: int, replace_deleted: bool = False
    ) -> None:
        v = self.space.preprocess(vec)[0]
        if replace_deleted:
            assert self.allow_replace_deleted, (
                "index built with allow_replace_deleted=False"
            )
            self._builder.add_replace(v, label)
        else:
            self._builder.add(v, label)
        self._dirty = True

    def mark_deleted(self, label: int) -> None:
        self._builder.mark_deleted(label)
        self._dirty_deleted = True

    def unmark_deleted(self, label: int) -> None:
        self._builder.unmark_deleted(label)
        self._dirty_deleted = True

    @property
    def num_elements(self) -> int:
        return self._builder.size

    @property
    def deleted_count(self) -> int:
        """getDeletedCount analog (hnswalg.h:221-223)."""
        return self._builder.num_deleted

    @property
    def max_elements(self) -> int:
        """getMaxElements analog (hnswalg.h:213-215): allocated slot
        capacity. Unlike hnswlib this index auto-grows past it."""
        return self._builder.capacity

    @property
    def index_file_size(self) -> int:
        """indexFileSize analog (hnswalg.h:658-683): byte size of the
        hnswlib binary save an equivalent index would produce (header +
        per-element level-0 block + upper linklists). This framework's own
        checkpoint is npz (`save`), so this is a capacity-planning figure,
        not the size of `save()` output."""
        return self._builder.index_file_size

    def clear(self) -> None:
        """clear() analog (hnswalg.h:149-161): drop all index content and
        device state, keeping the configuration. Unlike the reference (which
        frees storage for teardown), the index stays usable for new
        inserts."""
        self._builder.clear()
        self._device = None
        self._dirty = True
        self._dirty_deleted = False
        self._synced_n = 0

    def get_items(self, labels) -> np.ndarray:
        """getDataByLabel analog (hnswalg.h:826-851), batched: stored
        vectors for external labels, decoded back to the caller's input
        domain (the shifted-uint8 space un-shifts; normalized spaces return
        the stored normalized form, like the reference returns stored
        bytes). Raises KeyError for an absent or delete-marked label like
        the reference's throws."""
        labs = np.atleast_1d(np.asarray(labels, dtype=np.int64))
        return self.space.decode(np.stack(
            [self._builder.get_data_by_label(int(l)) for l in labs]
        ))

    @property
    def graph(self) -> HNSWGraph:
        return self._builder.export_graph()

    # -- device state --------------------------------------------------------

    def _sync_device(self):
        if self._device is None:
            self._full_sync()
            self._last_sync_mode = "full"
        elif self._dirty:
            if not self._try_incremental_sync():
                self._full_sync()
                self._last_sync_mode = "full"
            else:
                self._refresh_deleted()
                self._last_sync_mode = "delta"
        elif self._dirty_deleted:
            self._refresh_deleted()
            self._last_sync_mode = "deleted"
        else:
            self._last_sync_mode = "clean"
        self._dirty = False
        self._dirty_deleted = False
        return self._device

    def _full_sync(self):
        """Rebuild every device array from the host engine (initial upload,
        growth past the padded capacity, or after an in-place update).

        The previous tables are released FIRST: a serve-trim tier at the
        HBM edge (e.g. 4M int4, res/sweep_4m.json) cannot hold old+new
        tables at once — the re-sync after a mutation would OOM at 2x
        residency. Release is by refcount, so a caller that still holds
        the returned arrays (sweep drivers measuring against them) keeps
        them alive — and pays the 2x peak — by choice. A failed rebuild
        therefore leaves no stale-but-servable tables; callers retry the
        sync (utils/retry.py) rather than serve a pre-mutation view."""
        self._device = None
        # the landmark cache keys on the old tuple's identity — after a
        # rebuild it can only miss, and keeping it would pin the old
        # tables (it holds the tuple) right through the new allocation
        self._landmark_cache = None
        g = self._builder.export_graph()
        n = g.num_nodes
        headroom = int(n * self.growth_headroom)
        n_pad = round_up(n + 1 + headroom, 128)
        dg = graph_device_arrays(g, n_pad)
        x_np = pad_vectors(self._builder.export_vectors(), n_pad)
        # block each transfer: a transient relay failure must surface HERE
        # (inside the caller's retry scope), not poison downstream buffers
        x = jax.block_until_ready(jnp.asarray(x_np, dtype=self.space.storage_dtype))
        sq = (
            jax.block_until_ready(
                jnp.sum(x.astype(jnp.float32) * x.astype(jnp.float32), axis=-1)
            )
            if self.space.needs_sq_norms
            else None
        )
        nbr_vec = None
        if self.inline_neighbors:
            from hnsw_tpu.ops.pallas_gather import build_inline_tables

            nbr_vec = build_inline_tables(
                x, dg, self.dim, self.unified_max_bytes, SPLIT_MAX_BYTES,
                upper_inline=self.upper_inline,
                exact_i8=self.space.exact_i8,
                keep_delta_tables=self.keep_delta_tables,
            )
        deleted = np.zeros(n_pad, dtype=bool)
        deleted[:n] = self._builder.export_deleted().astype(bool)
        labels_np = np.full(n_pad, -1, dtype=np.int64)
        labels_np[:n] = g.labels
        self._device = (dg, x, sq, deleted, labels_np, nbr_vec)
        self._builder.clear_dirty()
        self._synced_n = n

    def _refresh_deleted(self):
        """Delete-marks touch no graph or vector state — refresh only the
        host-side eligibility mask (markDelete semantics, hnswalg.h:853-900)."""
        dg, x, sq, _, labels_np, nbr_vec = self._device
        deleted = np.zeros(dg.n_pad, dtype=bool)
        n = self._builder.size
        deleted[:n] = self._builder.export_deleted().astype(bool)
        self._device = (dg, x, sq, deleted, labels_np, nbr_vec)

    def _try_incremental_sync(self) -> bool:
        """Apply insert AND in-place-update deltas (changed level-0 rows,
        appended/updated vector rows) to the live device arrays. An update's
        staleness is local after all: the only device rows embedding the old
        vector are its level-0 in-neighbors' inline rows (found by the
        native engine's flush_updates scan) plus the small upper tables
        (rebuilt wholesale on upper_dirty). Returns False only on growth
        past the padded capacity (reference analog: updatePoint repairs
        locally too, hnswalg.h:995-1150)."""
        b = self._builder
        flags = b.dirty_flags
        if flags & 2:
            return False
        dg, x, sq, deleted, labels_np, nbr_vec = self._device
        if (
            nbr_vec is not None
            and nbr_vec[0] in ("unified8", "unified4")
            and nbr_vec[3] is None
        ):
            # serve-only table (keep_delta_tables=False): the quantized side
            # tables needed to re-pack dirty rows were dropped at sync
            return False
        n_pad = dg.n_pad
        sent = n_pad - 1
        n = b.size
        old_n = self._synced_n
        if n + 1 > n_pad:
            return False
        n_new = n - old_n
        n_upd = b.flush_updates()  # must precede take_dirty
        vec_ids = b.take_vec_dirty(n_upd)
        nb = _bucket(n_new + n_upd)
        dirty_ids = b.take_dirty()
        k = dirty_ids.shape[0]
        if k == 0 and n_new == 0 and n_upd == 0 and not (flags & 1):
            return True
        m0_pad = dg.level0.shape[1]
        rows = b.export_level0_rows(dirty_ids)
        rows = np.where(rows < 0, sent, rows).astype(np.int32)
        if rows.shape[1] != m0_pad:
            rows = np.concatenate(
                [rows, np.full((k, m0_pad - rows.shape[1]), sent, np.int32)],
                axis=1,
            )
        if k > n_pad // 2:
            # the delta's inline-row refresh (k*m0 row gathers) would cost
            # more than rebuilding the whole table — full resync is cheaper
            return False
        new_vecs = np.zeros((nb, self.dim), np.float32)
        new_ids = np.full(nb, sent, np.int32)
        if n_new:
            new_vecs[:n_new] = b.export_vectors_range(old_n, n_new)
            new_ids[:n_new] = np.arange(old_n, n, dtype=np.int32)
        if n_upd:
            # in-place updates ride the same scatter as appended rows
            new_vecs[n_new : n_new + n_upd] = b.export_vectors_rows(vec_ids)
            new_ids[n_new : n_new + n_upd] = vec_ids

        kind = "off" if nbr_vec is None else nbr_vec[0]
        dummy_t = jnp.zeros((1, 1, 1), jnp.int32)
        dummy_c = jnp.zeros((1, 1), jnp.int8)
        dummy_s = jnp.zeros((1,), jnp.float32)
        cds, scl = dummy_c, dummy_s
        if kind == "unified":
            nv, l0t = nbr_vec[1], dummy_t
        elif kind in ("unified8", "unified4"):
            nv, l0t = nbr_vec[1], dummy_t
            cds, scl = nbr_vec[3], nbr_vec[4]
        elif kind == "split":
            nv, l0t = nbr_vec[1], nbr_vec[2]
        else:
            nv, l0t = jnp.zeros((1, 1, 1), jnp.bfloat16), dummy_t
        # Apply in bounded slices: a bulk-build wave can dirty 100k+ rows,
        # and one shot's pack/gather transients (~4KB x K for unified rows)
        # spike past the HBM edge when a 10GB+ table is live. Each slice is
        # a sentinel-padded power-of-two bucket; new vectors ride only the
        # first call.
        level0 = dg.level0
        sq_in = sq if sq is not None else jnp.zeros((1,), jnp.float32)
        chunk = DELTA_CHUNK
        slices = list(range(0, k, chunk)) or [0]
        for si, s0 in enumerate(slices):
            ids_c = dirty_ids[s0 : s0 + chunk]
            rows_c = rows[s0 : s0 + chunk]
            kc = ids_c.shape[0]
            kb = _bucket(kc)
            if kb != kc:
                ids_c = np.concatenate([ids_c, np.full(kb - kc, sent, np.int32)])
                rows_c = np.concatenate(
                    [rows_c, np.full((kb - kc, m0_pad), sent, np.int32)]
                )
            nv_c = new_vecs if si == 0 else np.zeros((0, self.dim), np.float32)
            ni_c = new_ids if si == 0 else np.zeros((0,), np.int32)
            x, sq_in, level0, nv, l0t, cds, scl = _apply_row_deltas(
                x,
                sq_in,
                level0,
                nv,
                l0t,
                cds,
                scl,
                jnp.asarray(nv_c),
                jnp.asarray(ni_c),
                jnp.asarray(ids_c),
                jnp.asarray(rows_c),
                inline_kind=kind,
                has_sq=sq is not None,
                exact_i8=self.space.exact_i8,
            )
        sq = sq_in if sq is not None else None
        if kind == "unified":
            # keep the (unchanged) upper-level tables — dropping them made
            # the tag a 2-tuple and broke inline_search_kwargs downstream
            nbr_vec = ("unified", nv, nbr_vec[2])
        elif kind in ("unified8", "unified4"):
            nbr_vec = (kind, nv, nbr_vec[2], cds, scl)
        elif kind == "split":
            nbr_vec = ("split", nv, l0t)
        else:
            nbr_vec = None

        labels_changed = n_new > 0
        if n_new:
            labels_np = labels_np.copy()
            labels_np[old_n:n] = b.export_labels_range(old_n, n_new)
        if n_upd:
            # a replace_deleted reuse changes the label at the updated slot
            for i in vec_ids:
                lab = b.export_labels_range(int(i), 1)[0]
                if labels_np[i] != lab:
                    if not labels_changed:
                        labels_np = labels_np.copy()
                        labels_changed = True
                    labels_np[i] = lab
        rep = {"level0": level0, "num_nodes": jnp.asarray(n, jnp.int32)}
        if flags & 1:
            # upper levels / entry changed: re-derive the (small) upper
            # arrays wholesale
            g = b.export_graph()
            upper, upper_slot = upper_host_arrays(g, n_pad)
            rep.update(
                upper=jnp.asarray(upper),
                upper_slot=jnp.asarray(upper_slot),
                entry_point=jnp.asarray(g.entry_point, jnp.int32),
            )
        if labels_changed:
            lab_dev = np.full(n_pad, -1, dtype=np.int64)
            lab_dev[:n] = labels_np[:n]
            rep["labels"] = jnp.asarray(lab_dev)
        dg = dataclasses.replace(dg, **rep)
        if (
            kind in ("unified", "unified8", "unified4")
            and (flags & 1)
            and dg.max_level > 0
            and self.upper_inline
        ):
            # upper tables reference upper adjacency + vectors: rebuild
            # (small, ~N/M rows) after both were updated
            from hnsw_tpu.ops.pallas_gather import (
                make_upper_tables,
                upper_level_sizes_u,
            )

            sizes = upper_level_sizes_u(dg.upper_slot, dg.upper.shape[1])
            upper_tabs = jax.jit(
                functools.partial(make_upper_tables, level_sizes=sizes)
            )(x, dg.upper, dg.upper_slot)
            nbr_vec = (kind, nbr_vec[1], upper_tabs) + tuple(nbr_vec[3:])
        self._device = (dg, x, sq, deleted, labels_np, nbr_vec)
        self._landmark_cache = None  # identity-keyed: stale, and it pins
        self._synced_n = n           # pre-delta array versions
        return True

    def rebuild_device_tables(self, unified_max_bytes: int | None = None):
        """Drop and rebuild all device arrays (optionally with a new unified
        budget). Use after a bulk build to upgrade the serving tables: waves
        keep the split layout (their row-delta refresh peaks too high with a
        12GiB unified table live), but a query-only index wants unified. The
        old tables are freed BEFORE the rebuild so peak HBM is one table, not
        both."""
        import gc

        if unified_max_bytes is not None:
            self.unified_max_bytes = unified_max_bytes
        self._device = None
        self._landmark_cache = None  # pins the old tuple otherwise
        gc.collect()  # drop relay-side buffers before allocating the new table
        self._dirty = True
        return self._sync_device()

    @property
    def device_graph(self) -> DeviceGraph:
        return self._sync_device()[0]

    @property
    def device_vectors(self) -> jax.Array:
        return self._sync_device()[1]

    @property
    def device_sq_norms(self) -> jax.Array | None:
        return self._sync_device()[2]

    # -- search ---------------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        ef: int = 200,
        *,
        filter_labels: np.ndarray | None = None,
        entry_ids: np.ndarray | None = None,
        entry_seeds: int = 0,
        seed_pool: int = 0,
        params: SearchParams | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched kNN → (dists [B, k], labels [B, k]; label -1 = missing).

        Rows are ascending by distance — searchKnnCloserFirst semantics
        (hnswlib/hnswlib.h:197-201, which reverses searchKnn's max-heap
        order) are the native output order here, no reversal needed.

        `filter_labels`: bool mask over external labels (BaseFilterFunctor
        semantics, hnswlib/hnswlib.h:128-132) — either one shared [L] mask
        for the whole batch, or a per-query [B, L] mask (the reference's
        functor is evaluated per query; per-tenant serving filters need a
        different allowlist per row). Deleted elements are always excluded
        from results (markDelete semantics, hnswalg.h:853-900).

        `entry_seeds` / `seed_pool`: landmark-seeded entry — shorthand for
        `SearchParams(entry_seeds=, seed_pool=)` when no explicit `params`
        is given.
        """
        if params is None:
            params = SearchParams(k=k, ef=max(ef, k),
                                  entry_seeds=entry_seeds,
                                  seed_pool=seed_pool)
        dg, x, sq, deleted, labels_np, nbr_vec = self._sync_device()
        q_np = self.space.preprocess(queries)
        b0 = q_np.shape[0]
        # Pallas hop kernel tiles the batch by >=8 queries.
        b_pad = ((b0 + 15) // 16) * 16
        if b_pad != b0:
            q_np = np.concatenate(
                [q_np, np.zeros((b_pad - b0, self.dim), np.float32)]
            )
        q = jnp.asarray(q_np)

        eligible = None
        if deleted.any() or filter_labels is not None:
            eligible = ~deleted
            if filter_labels is not None:
                fl = np.asarray(filter_labels, dtype=bool)
                valid = labels_np >= 0
                if fl.ndim == 2:
                    # per-query masks: expand label-space rows to node-space
                    # [B, N_pad] (padded queries get all-False rows — their
                    # results are discarded anyway)
                    assert fl.shape[0] == b0, (
                        f"filter_labels rows {fl.shape[0]} != batch {b0}"
                    )
                    ok = np.zeros((b_pad, eligible.shape[0]), dtype=bool)
                    ok[:b0, valid] = fl[:, labels_np[valid]]
                    eligible = eligible[None, :] & ok
                else:
                    ok = np.zeros_like(eligible)
                    ok[valid] = fl[labels_np[valid]]
                    eligible = eligible & ok
            eligible = jnp.asarray(eligible)

        m_res = params.rescore
        if m_res is None:
            kind = nbr_vec[0] if nbr_vec else "off"
            # the exact-u8 space's unified8 codes are lossless (scale 1),
            # so there is no quantization recall to buy back
            lossy = kind == "unified4" or (
                kind == "unified8" and not self.space.exact_i8
            )
            m_res = 4 * params.k if lossy else 0
        m_res = min(m_res, params.ef)
        # the rescore re-ranks the top m_res beam candidates, so the search
        # must RETURN that many — asking for k and rescoring "the top 4k"
        # would silently re-rank only k candidates
        k_search = max(params.k, m_res) if m_res >= params.k else params.k
        seed_kwargs = {}
        if params.entry_seeds > 0 and entry_ids is None and dg.max_level > 0:
            lm = self._landmark_arrays(dg, x, sq,
                                       pool_extra=params.seed_pool)
            if lm is not None:
                from hnsw_tpu.ops.topk import bruteforce_topk

                lv, li, lsq = lm
                s = min(params.entry_seeds, int(li.shape[0]),
                        max(params.ef, k_search))
                sd, si = bruteforce_topk(
                    q, lv, s, self.space.name, x_sq_norms=lsq
                )
                seed_kwargs = {
                    "seed_ids": jnp.take(li, si, axis=0),
                    "seed_dists": sd,
                }
        res = search_batch(
            x,
            dg,
            q,
            k=k_search,
            ef=max(params.ef, k_search),
            space=self.space.name,
            sq_norms=sq,
            eligible=eligible,
            entry_ids=None
            if entry_ids is None
            else jnp.asarray(
                np.concatenate(
                    [np.asarray(entry_ids), np.zeros(b_pad - b0, np.int32)]
                ).astype(np.int32)
            ),
            **inline_search_kwargs(nbr_vec),
            expand=params.expand,
            max_iters=params.max_iters,
            collect_metrics=params.collect_metrics,
            has_mask=eligible is not None,
            interpret=jax.default_backend() != "tpu",
            stop_patience=params.stop_patience,
            stop_frontier=params.stop_frontier,
            frontier_rank=params.frontier_rank,
            stop_fn=params.stop_fn,
            **seed_kwargs,
        )
        if m_res >= params.k and m_res > 0:
            rd, ri = _rescore_topk(
                q,
                x,
                res.ids,
                res.dists,
                k=params.k,
                m=m_res,
                space=self.space.name,
                interpret=jax.default_backend() != "tpu",
            )
            res = SearchResults(
                rd, ri, res.hops, res.dist_comps, res.last_improve
            )
        dists = np.asarray(res.dists)[:b0]
        ids = np.asarray(res.ids)[:b0]
        labels = np.where(ids < len(labels_np), labels_np[np.minimum(ids, len(labels_np) - 1)], -1)
        labels = np.where(np.isfinite(dists), labels, -1)
        self.last_metrics = SearchResults(
            res.dists[:b0],
            res.ids[:b0],
            np.asarray(res.hops)[:b0],
            np.asarray(res.dist_comps)[:b0],
            None
            if res.last_improve is None
            else np.asarray(res.last_improve)[:b0],
        )
        return dists, labels

    def _landmark_arrays(self, dg, x, sq, pool_extra: int = 0):
        """Device arrays for the landmark-seeded entry mode
        (SearchParams.entry_seeds), cached per (device-sync generation,
        pool_extra) — any row delta or full sync replaces self._device,
        invalidating the cache."""
        cache = getattr(self, "_landmark_cache", None)
        if (cache is not None and cache[0] is self._device
                and cache[1] == pool_extra):
            return cache[2]
        lm = landmark_arrays(dg, x, sq, pool_extra=pool_extra)
        self._landmark_cache = (self._device, pool_extra, lm)
        return lm

    def calibrate_speed_mode(
        self,
        queries: np.ndarray | None = None,
        *,
        k: int = 10,
        ef: int = 200,
        expand: int = 2,
        stop_frontier: float = 1.15,
        percentile: float = 99.9,
        margin: int = 2,
        sample: int = 2048,
        seed: int = 0,
        entry_seeds: int = 0,
        seed_pool: int = 0,
    ) -> SearchParams:
        """Auto-tune the adaptive-termination speed mode for THIS index and
        operating point, returning a ready `SearchParams` (also stored as
        `self.speed_params`).

        The batch traverses in lockstep, so batch time equals the slowest
        query's iteration count; the frontier stop (the reference's
        lower_bound-vs-candidate cut, hnswalg.h:342-436, relaxed by
        `stop_frontier`) leaves a straggler max-hop tail well past its p99.
        Late iterations almost never improve the top-k, so the budget is
        set from the tail of the LAST-IMPROVEMENT distribution — the last
        iteration at which each query's k-th best distance decreased — at
        `percentile` plus `margin` iterations of slack. This is the tuning
        recipe behind the measured headline speed mode (v5e, N=100k: 42.6k
        qps exhaustive -> 163k+ at equal recall; res/sweep_stop_*.json).

        `queries`: calibration batch; defaults to `sample` perturbed stored
        vectors (self-queries, the reference methodology,
        bin/experiment.py:160-234)."""
        if queries is None:
            n = self.num_elements
            rng = np.random.default_rng(seed)
            rows = rng.integers(0, n, size=min(sample, n))
            base = self._builder.export_vectors_rows(
                rows.astype(np.int64)
            ).astype(np.float32)
            queries = base + 0.05 * rng.standard_normal(
                base.shape
            ).astype(np.float32)
        probe = SearchParams(
            k=k, ef=max(ef, k), expand=expand,
            stop_frontier=stop_frontier, collect_metrics=True,
            entry_seeds=entry_seeds, seed_pool=seed_pool,
        )
        self.search(queries, params=probe)
        last = np.asarray(self.last_metrics.last_improve)
        cap = int(np.percentile(last, percentile)) + int(margin)
        cap = max(cap, 1)
        default_cap = 2 * max(ef, k) + 16
        if cap >= default_cap:
            cap = 0  # budget would never bind; leave uncapped
        self.speed_params = SearchParams(
            k=k, ef=max(ef, k), expand=expand,
            stop_frontier=stop_frontier, max_iters=cap,
            entry_seeds=entry_seeds, seed_pool=seed_pool,
        )
        return self.speed_params

    def search_cpu(
        self,
        queries: np.ndarray,
        k: int = 10,
        ef: int = 200,
        *,
        filter_labels: np.ndarray | None = None,
    ):
        """Single-core native CPU search (baseline parity path).

        `filter_labels` mirrors the device path's BaseFilterFunctor mask
        (hnswlib/hnswlib.h:128-132, hnswalg.h:1271): a bool mask over
        external labels — [L] shared, or [B, L] per query — so filtered
        device queries have a CPU oracle."""
        q = self.space.preprocess(queries)
        if filter_labels is not None:
            fl = np.asarray(filter_labels, dtype=bool)
            labs = self._builder.export_graph().labels
            if fl.ndim == 2:
                # per-query functor semantics: one filtered search per row
                assert fl.shape[0] == q.shape[0]
                parts = [
                    self._builder.search_batch(
                        q[i : i + 1], k, ef, eligible=fl[i][labs]
                    )
                    for i in range(q.shape[0])
                ]
                return tuple(np.concatenate(p) for p in zip(*parts))
            return self._builder.search_batch(q, k, ef, eligible=fl[labs])
        return self._builder.search_batch(q, k, ef, eligible=None)

    # -- persistence (reference: saveIndex/loadIndex hnswalg.h:685-822 and
    # the .adj export, index_builder/build.cpp:22-107) ----------------------

    def save(self, path: str, compress: bool = True) -> None:
        from hnsw_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            self._builder.export_graph(),
            self._builder.export_vectors(),
            self._builder.export_deleted(),
            compress=compress,
            meta={
                "space": self.space.persist_name,
                "dim": self.dim,
                "m": self.m,
                "ef_construction": self.ef_construction,
                "allow_replace_deleted": self.allow_replace_deleted,
            },
        )

    @classmethod
    def load(cls, path: str) -> "HNSWIndex":
        from hnsw_tpu.io.checkpoint import load_checkpoint

        return cls._from_parts(*load_checkpoint(path))

    @classmethod
    def _from_parts(cls, g, vectors, deleted, meta) -> "HNSWIndex":
        """Construct a live index from (graph, internal vectors, deleted
        mask, meta) — the shared tail of every persistence loader."""
        from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder

        self = cls.__new__(cls)
        self.space = get_space(meta["space"], meta["dim"])
        self.dim = meta["dim"]
        self.m = meta["m"]
        self.ef_construction = meta["ef_construction"]
        self.inline_neighbors = (
            jax.default_backend() == "tpu" and 2 * self.m <= 128
        )
        self.unified_max_bytes = UNIFIED_MAX_BYTES
        self.upper_inline = True
        self.keep_delta_tables = True
        self._builder = NativeHNSWBuilder.from_graph(
            g, vectors, deleted, space=self.space.name,
            ef_construction=meta["ef_construction"],
        )
        self._device = None
        self._dirty = True
        self._dirty_deleted = False
        self._synced_n = 0
        self.allow_replace_deleted = bool(meta.get("allow_replace_deleted", False))
        self.growth_headroom = 1 / 16
        return self

    @classmethod
    def from_hnswlib(cls, path: str, space: str = "l2") -> "HNSWIndex":
        """Import a stock hnswlib binary index file (the saveIndex format,
        hnswlib/hnswalg.h:685-822) — graph topology, vectors, labels and
        delete marks — into a live TPU index. `space` is the space the file
        was built over: 'l2' / 'ip' / 'cosine' (f32 data) or 'l2u8' (the
        integer L2SpaceI layout). Validated against index files the actual
        compiled reference engine saves (tests/test_hnswlib_bin.py)."""
        from hnsw_tpu.io.hnswbin import read_bin

        g, vectors, deleted, meta = read_bin(path, space=space)
        sp = get_space(space, meta["dim"])
        # file vectors are raw inserted values; internal storage is the
        # space's preprocessed form (shift for l2u8, normalize for cosine —
        # idempotent on already-normalized rows)
        internal = sp.preprocess(vectors) if g.num_nodes else np.zeros(
            (0, meta["dim"]), np.float32
        )
        return cls._from_parts(
            g, internal, deleted,
            {"space": space, "dim": meta["dim"], "m": meta["m"],
             "ef_construction": meta["ef_construction"]},
        )

    def save_hnswlib(self, path: str) -> None:
        """Export to the stock hnswlib saveIndex format, loadable by the
        reference engine's loadIndex (round-tripped through the actual
        compiled engine in tests/test_hnswlib_bin.py). 'l2'/'ip' write f32
        data for L2Space/InnerProductSpace, 'cosine' writes the normalized
        rows (load over InnerProductSpace), 'l2u8' writes u8 codes for
        L2SpaceI."""
        from hnsw_tpu.io.hnswbin import write_bin

        vectors = self._builder.export_vectors()
        name = self.space.persist_name
        if name == "l2u8":
            vectors = self.space.decode(vectors)  # back to u8-range codes
        write_bin(
            path, self._builder.export_graph(), vectors,
            self._builder.export_deleted(), space=name, m=self.m,
            ef_construction=self.ef_construction,
        )

    def export_adj(self, path: str) -> None:
        """Write the reference-compatible adjacency file
        (format: index_builder/build.cpp:14-21) — native streaming writer."""
        self._builder.export_adj(path)
