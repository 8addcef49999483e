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

from hnsw_tpu.core.graph import (
    DeviceGraph,
    HNSWGraph,
    graph_device_arrays,
    pad_vectors,
    round_up,
)
from hnsw_tpu.core.spaces import Space, get_space
from hnsw_tpu.ops.traversal import SearchResults, search_batch


@dataclasses.dataclass
class SearchParams:
    k: int = 10
    ef: int = 200
    expand: int = 1  # beam entries expanded per traversal step
    max_iters: int = 0  # 0 => 2*ef + 16
    collect_metrics: bool = False


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
    ):
        if isinstance(space, str):
            assert dim is not None, "dim required when space given by name"
            space = get_space(space, dim)
        self.space = space
        self.dim = space.dim
        self.m = m
        self.ef_construction = ef_construction
        # Inline neighbor-vector table (fast traversal path): one contiguous
        # DMA per hop instead of maxM0 random row reads. Costs maxM0 x extra
        # HBM for (bf16) vectors; default on for TPU backends.
        if inline_neighbors is None:
            inline_neighbors = jax.default_backend() == "tpu"
        if inline_neighbors and 2 * m > 32:
            # tiled level-0 layout packs a node's ids into one 128-lane row
            # (make_level0_tiles requires maxM0 <= 32); fall back to the XLA
            # gather path rather than assert — the reference allows any M.
            inline_neighbors = False
        self.inline_neighbors = inline_neighbors
        from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder

        self._builder = NativeHNSWBuilder(
            self.dim, space.name, m, ef_construction, seed
        )
        self._device = None  # (DeviceGraph, vectors, sq_norms, deleted_mask, labels_np)
        self._dirty = True

    # -- construction --------------------------------------------------------

    def add_items(self, data: np.ndarray, labels: np.ndarray | None = None) -> None:
        data = self.space.preprocess(data)
        if labels is None:
            start = self._builder.size
            labels = np.arange(start, start + data.shape[0], dtype=np.int64)
        self._builder.add_batch(data, np.asarray(labels, dtype=np.int64))
        self._dirty = True

    def add_point(self, vec: np.ndarray, label: int) -> None:
        self._builder.add(self.space.preprocess(vec)[0], label)
        self._dirty = True

    def mark_deleted(self, label: int) -> None:
        self._builder.mark_deleted(label)
        self._dirty = True

    def unmark_deleted(self, label: int) -> None:
        self._builder.unmark_deleted(label)
        self._dirty = True

    @property
    def num_elements(self) -> int:
        return self._builder.size

    @property
    def graph(self) -> HNSWGraph:
        return self._builder.export_graph()

    # -- device state --------------------------------------------------------

    def _sync_device(self):
        if self._device is not None and not self._dirty:
            return self._device
        g = self._builder.export_graph()
        n = g.num_nodes
        n_pad = round_up(n + 1, 128)
        dg = graph_device_arrays(g, n_pad)
        x_np = pad_vectors(self._builder.export_vectors(), n_pad)
        x = jnp.asarray(x_np, dtype=self.space.storage_dtype)
        sq = (
            jnp.sum(jnp.asarray(x_np) ** 2, axis=-1)
            if self.space.needs_sq_norms
            else None
        )
        if self.inline_neighbors:
            from hnsw_tpu.ops.pallas_gather import (
                make_inline_neighbors,
                make_level0_tiles,
            )

            nbr_vec = jax.block_until_ready(make_inline_neighbors(x, dg.level0))
            l0_tiles = jax.block_until_ready(jax.jit(make_level0_tiles)(dg.level0))
            nbr_vec = (nbr_vec, l0_tiles)
        else:
            nbr_vec = None
        deleted = np.zeros(n_pad, dtype=bool)
        deleted[:n] = self._builder.export_deleted().astype(bool)
        labels_np = np.full(n_pad, -1, dtype=np.int64)
        labels_np[:n] = np.asarray(jax.device_get(dg.labels))[:n]
        self._device = (dg, x, sq, deleted, labels_np, nbr_vec)
        self._dirty = False
        return self._device

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
        params: SearchParams | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched kNN → (dists [B, k], labels [B, k]; label -1 = missing).

        `filter_labels`: bool mask over external labels (BaseFilterFunctor
        semantics, hnswlib/hnswlib.h:128-132). Deleted elements are always
        excluded from results (markDelete semantics, hnswalg.h:853-900).
        """
        if params is None:
            params = SearchParams(k=k, ef=max(ef, k))
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
                ok = np.zeros_like(eligible)
                valid = labels_np >= 0
                ok[valid] = np.asarray(filter_labels, dtype=bool)[labels_np[valid]]
                eligible = eligible & ok
            eligible = jnp.asarray(eligible)

        res = search_batch(
            x,
            dg,
            q,
            k=params.k,
            ef=params.ef,
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
            nbr_vectors=None if nbr_vec is None else nbr_vec[0],
            level0_tiles=None if nbr_vec is None else nbr_vec[1],
            expand=params.expand,
            max_iters=params.max_iters,
            collect_metrics=params.collect_metrics,
            has_mask=eligible is not None,
            interpret=jax.default_backend() != "tpu",
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
        )
        return dists, labels

    def search_cpu(self, queries: np.ndarray, k: int = 10, ef: int = 200):
        """Single-core native CPU search (baseline parity path)."""
        return self._builder.search_batch(self.space.preprocess(queries), k, ef)

    # -- persistence (reference: saveIndex/loadIndex hnswalg.h:685-822 and
    # the .adj export, index_builder/build.cpp:22-107) ----------------------

    def save(self, path: str) -> None:
        from hnsw_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            self._builder.export_graph(),
            self._builder.export_vectors(),
            self._builder.export_deleted(),
            meta={
                "space": self.space.name,
                "dim": self.dim,
                "m": self.m,
                "ef_construction": self.ef_construction,
            },
        )

    @classmethod
    def load(cls, path: str) -> "HNSWIndex":
        from hnsw_tpu.io.checkpoint import load_checkpoint
        from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder

        g, vectors, deleted, meta = load_checkpoint(path)
        self = cls.__new__(cls)
        self.space = get_space(meta["space"], meta["dim"])
        self.dim = meta["dim"]
        self.m = meta["m"]
        self.ef_construction = meta["ef_construction"]
        self.inline_neighbors = jax.default_backend() == "tpu"
        self._builder = NativeHNSWBuilder.from_graph(
            g, vectors, deleted, space=meta["space"],
            ef_construction=meta["ef_construction"],
        )
        self._device = None
        self._dirty = True
        return self

    def export_adj(self, path: str) -> None:
        """Write the reference-compatible adjacency file
        (format: index_builder/build.cpp:14-21)."""
        from hnsw_tpu.io.adj import write_adj

        write_adj(self._builder.export_graph(), path)
