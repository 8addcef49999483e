"""Multi-device sharded HNSW search.

The reference's only "distribution" is an HTTP storage/compute split on
localhost (SURVEY.md §2: no collectives of any kind; per-vector HTTP GETs,
hnsw_service/hnsw_graph.cpp:174-212). The TPU-native replacement follows
BASELINE.json config 4: the dataset is partitioned into one complete HNSW
sub-index per device, all device arrays are stacked [S, ...] and sharded over
a mesh axis, queries are replicated; each device runs the batched beam
traversal on its local shard inside `shard_map`, and per-shard top-k results
are merged with one `all_gather` over ICI — the XLA-collective equivalent of
the reference's per-node network fetches, at ~10^6x lower latency per hop.

A second mesh axis ("dp") shards the query batch — the data-parallel axis —
so a (dp, shard) 2D mesh scales both index size and query throughput.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hnsw_tpu.core.graph import (
    DeviceGraph,
    graph_device_arrays,
    pad_vectors,
    round_up,
)
from hnsw_tpu.core.spaces import Space, get_space
from hnsw_tpu.ops.topk import topk_smallest
from hnsw_tpu.ops.traversal import search_batch


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedIndexArrays:
    """Stacked per-shard device arrays; leading axis S is sharded.

    `nbr_vectors` is the inline neighbor-vector fast-path table (may be a
    dummy [S, 1, 1, 1] when disabled — aux fields must stay arrays to remain
    a jit-able pytree)."""

    vectors: jax.Array  # [S, n_pad, D]
    sq_norms: jax.Array  # [S, n_pad] (zeros for ip space)
    level0: jax.Array  # [S, n_pad, maxM0]
    upper: jax.Array  # [S, L, U_pad, M]
    upper_slot: jax.Array  # [S, L, n_pad]
    labels: jax.Array  # [S, n_pad] int64 (-1 padding)
    entry_point: jax.Array  # [S] int32
    num_nodes: jax.Array  # [S] int32
    nbr_vectors: jax.Array  # [S, n_pad, maxM0, D] bf16, or [S,1,1,1] dummy
    level0_tiles: jax.Array  # [S, n_pad/32, 8, 128] int32, or [S,1,1,1] dummy


def _local_graph(a: ShardedIndexArrays) -> DeviceGraph:
    """View the (already shard-local, leading dim stripped) arrays as a
    DeviceGraph for search_batch."""
    return DeviceGraph(
        level0=a.level0,
        upper=a.upper,
        upper_slot=a.upper_slot,
        labels=a.labels,
        entry_point=a.entry_point,
        num_nodes=a.num_nodes,
    )


def _make_sharded_inline_chunked(
    vecs_dev: jax.Array,  # [S, n_pad, D] sharded on S
    level0_dev: jax.Array,  # [S, n_pad, m0] sharded on S
    out_sharding,
    chunk: int = 1 << 17,
) -> jax.Array:
    """Chunked analog of vmap(make_inline_neighbors): per-device transient
    stays at one [S_local, chunk, m0, d_pad] slab instead of 2x the whole
    per-shard table (see make_inline_neighbors_chunked for the HBM-edge
    failure mode this avoids)."""
    s, n_pad, d = vecs_dev.shape
    m0 = level0_dev.shape[2]
    d_pad = round_up(d, 128)

    @functools.partial(
        jax.jit, donate_argnums=(0,), out_shardings=out_sharding
    )
    def upd(tab, xc, lvl, start):
        def one(x1, l1):
            rows = jnp.take(x1, l1.reshape(-1), axis=0)
            if d_pad != d:
                rows = jnp.pad(rows, ((0, 0), (0, d_pad - d)))
            return rows.reshape(l1.shape[0], m0, d_pad)

        rows = jax.vmap(one)(xc, lvl)  # [S, chunk, m0, d_pad]
        return jax.lax.dynamic_update_slice(tab, rows, (0, start, 0, 0))

    xc = jax.jit(
        lambda v: v.astype(jnp.bfloat16), out_shardings=None
    )(vecs_dev)
    tab = jax.jit(
        lambda: jnp.zeros((s, n_pad, m0, d_pad), jnp.bfloat16),
        out_shardings=out_sharding,
    )()
    for st in range(0, n_pad, chunk):
        e = min(st + chunk, n_pad)
        tab = upd(tab, xc, level0_dev[:, st:e], jnp.int32(st))
    return jax.block_until_ready(tab)


def build_sharded_arrays(
    shards: list[tuple["HNSWGraph", np.ndarray]],
    space: Space,
    mesh: Mesh,
    shard_axis: str = "shard",
    inline_neighbors: bool | None = None,
) -> ShardedIndexArrays:
    """Stack per-shard (graph, vectors) into uniform [S, ...] arrays and
    place them sharded over `mesh[shard_axis]`. Pads every shard to common
    n_pad / max_level / upper width so shapes are static."""
    s = len(shards)
    n_pad = max(round_up(g.num_nodes + 1, 128) for g, _ in shards)
    max_l = max(g.max_level for g, _ in shards)
    dim = shards[0][1].shape[1]
    max_m0 = max(g.max_m0 for g, _ in shards)
    max_m = max((g.max_m for g, _ in shards if g.max_level > 0), default=1)

    dgs = []
    for g, _ in shards:
        assert g.max_m0 == max_m0, "shards must share maxM0"
        dgs.append(graph_device_arrays(g, n_pad))

    u_pad = max((dg.upper.shape[1] for dg in dgs if dg.max_level > 0), default=1)

    level0 = np.zeros((s, n_pad, max_m0), dtype=np.int32)
    upper = np.full((s, max_l, u_pad, max_m), n_pad - 1, dtype=np.int32)
    upper_slot = np.full((s, max_l, n_pad), u_pad - 1, dtype=np.int32)
    labels = np.full((s, n_pad), -1, dtype=np.int64)
    entry = np.zeros(s, dtype=np.int32)
    nn = np.zeros(s, dtype=np.int32)
    vecs = np.zeros((s, n_pad, dim), dtype=np.float32)

    for i, ((g, x), dg) in enumerate(zip(shards, dgs)):
        level0[i] = np.asarray(dg.level0)
        l_i = dg.max_level
        if l_i > 0:
            u_i = dg.upper.shape[1]
            m_i = dg.upper.shape[2]
            upper[i, :l_i, :u_i, :m_i] = np.asarray(dg.upper)
            upper_slot[i, :l_i] = np.asarray(dg.upper_slot)
        labels[i] = np.asarray(dg.labels)
        entry[i] = int(dg.entry_point)
        nn[i] = int(dg.num_nodes)
        vecs[i] = pad_vectors(x, n_pad)

    sq = (vecs.astype(np.float64) ** 2).sum(-1).astype(np.float32)

    if inline_neighbors is None:
        inline_neighbors = jax.default_backend() == "tpu"
    if inline_neighbors and max_m0 > 32:
        inline_neighbors = False  # tiled layout supports maxM0 <= 32 only

    shard_spec = lambda *rest: NamedSharding(mesh, P(shard_axis, *rest))
    put = lambda a, spec: jax.device_put(jnp.asarray(a), spec)
    vecs_dev = put(vecs, shard_spec(None, None))
    level0_dev = put(level0, shard_spec(None, None))
    if inline_neighbors:
        from hnsw_tpu.ops.pallas_gather import (
            make_inline_neighbors,
            make_level0_tiles,
        )

        per_shard_bytes = n_pad * max_m0 * round_up(dim, 128) * 2
        if per_shard_bytes > 2**31:
            # single-shot gather transiently peaks ~2x per-shard table size
            # (HBM-edge OOM at Deep10M-scale shards) — build the [S] tables
            # chunk-wise over the node axis with a donated accumulator
            nbr_vec = _make_sharded_inline_chunked(
                vecs_dev, level0_dev, shard_spec(None, None, None)
            )
        else:
            nbr_vec = jax.jit(
                jax.vmap(make_inline_neighbors),
                out_shardings=shard_spec(None, None, None),
            )(vecs_dev, level0_dev)
        l0_tiles = jax.jit(
            jax.vmap(make_level0_tiles),
            out_shardings=shard_spec(None, None, None),
        )(level0_dev)
    else:
        nbr_vec = put(
            np.zeros((s, 1, 1, 1), dtype=np.float16), shard_spec(None, None, None)
        )
        l0_tiles = put(
            np.zeros((s, 1, 1, 1), dtype=np.int32), shard_spec(None, None, None)
        )
    return ShardedIndexArrays(
        vectors=vecs_dev,
        sq_norms=put(sq, shard_spec(None)),
        level0=level0_dev,
        upper=put(upper, shard_spec(None, None, None)),
        upper_slot=put(upper_slot, shard_spec(None, None)),
        labels=put(labels, shard_spec(None)),
        entry_point=put(entry, shard_spec()),
        num_nodes=put(nn, shard_spec()),
        nbr_vectors=nbr_vec,
        level0_tiles=l0_tiles,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef", "space", "expand", "max_iters", "mesh", "dp_axis",
        "shard_axis", "has_mask", "has_entry",
    ),
)
def sharded_search(
    arrays: ShardedIndexArrays,
    queries: jax.Array,  # [B, D], replicated (or dp-sharded) across devices
    eligible: jax.Array,  # [S, n_pad] bool per-shard mask ([S, 1] dummy when off)
    entry_ids: jax.Array,  # [S, B] int32 per-shard entry override ([S, 1] dummy)
    *,
    k: int,
    ef: int,
    space: str = "l2",
    expand: int = 1,
    max_iters: int = 0,
    mesh: Mesh,
    dp_axis: str | None = None,
    shard_axis: str = "shard",
    has_mask: bool = False,
    has_entry: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Search all shards and merge → (dists [B, k], labels [B, k] int64).

    Inside shard_map each device searches its own sub-index with the full
    single-chip kernel; the [S, B, k] partial results are all-gathered over
    ICI and reduced by a length-S*k top-k merge, replicated back.

    `eligible` carries deleted-mark + label-filter eligibility per shard
    (markDelete/BaseFilterFunctor parity with the single-chip index,
    hnswalg.h:853-900, hnswlib.h:128-132); `entry_ids` carries per-shard
    local entry overrides (-1 = that shard's default entry point).
    """
    q_spec = P(dp_axis, None) if dp_axis else P()
    # every index leaf is sharded on its leading [S] axis
    arr_spec = ShardedIndexArrays(
        vectors=P(shard_axis, None, None),
        sq_norms=P(shard_axis, None),
        level0=P(shard_axis, None, None),
        upper=P(shard_axis, None, None, None),
        upper_slot=P(shard_axis, None, None),
        labels=P(shard_axis, None),
        entry_point=P(shard_axis),
        num_nodes=P(shard_axis),
        nbr_vectors=P(shard_axis, None, None, None),
        level0_tiles=P(shard_axis, None, None, None),
    )
    out_spec = (q_spec, q_spec) if dp_axis else (P(), P())
    elig_spec = P(shard_axis, None)
    # the dummy entry array is [S, 1] — only dp-split a real [S, B] one
    ent_spec = (
        P(shard_axis, dp_axis) if (dp_axis and has_entry) else P(shard_axis, None)
    )

    # static at trace time: real inline table vs [S,1,1,1] dummy. The real
    # table's node axis is n_pad >= 128, the dummy's is 1 — do NOT compare the
    # trailing dim to the query dim (the table is lane-padded to a multiple of
    # 128, so that check silently disabled the fast path for dim % 128 != 0).
    use_inline = arrays.nbr_vectors.shape[1] > 1
    interpret = jax.default_backend() != "tpu"

    def local(a: ShardedIndexArrays, q: jax.Array, el: jax.Array, en: jax.Array):
        # strip the leading local-shard dim (size 1 per device)
        a1 = jax.tree_util.tree_map(lambda t: t[0], a)
        res = search_batch(
            a1.vectors,
            _local_graph(a1),
            q,
            k=k,
            ef=ef,
            space=space,
            sq_norms=a1.sq_norms if space == "l2" else None,
            eligible=el[0] if has_mask else None,
            has_mask=has_mask,
            entry_ids=en[0] if has_entry else None,
            nbr_vectors=a1.nbr_vectors if use_inline else None,
            level0_tiles=a1.level0_tiles if use_inline else None,
            expand=expand,
            max_iters=max_iters,
            interpret=interpret,
        )
        # local ids -> global labels before leaving the shard
        lab = jnp.take(a1.labels, jnp.clip(res.ids, 0, a1.labels.shape[0] - 1))
        lab = jnp.where(jnp.isfinite(res.dists), lab, -1)
        # all-gather partials over ICI, merge top-k (replicated result)
        all_d = jax.lax.all_gather(res.dists, shard_axis)  # [S, B, k]
        all_l = jax.lax.all_gather(lab, shard_axis)  # [S, B, k]
        s = all_d.shape[0]
        b = all_d.shape[1]
        flat_d = jnp.moveaxis(all_d, 0, 1).reshape(b, s * k)
        flat_l = jnp.moveaxis(all_l, 0, 1).reshape(b, s * k)
        dk, pos = topk_smallest(flat_d, k)
        lk = jnp.take_along_axis(flat_l, pos, axis=-1)
        return dk, lk

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(arr_spec, q_spec, elig_spec, ent_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(arrays, queries, eligible, entry_ids)


class ShardedHNSWIndex:
    """Dataset partitioned into one HNSW sub-index per mesh shard.

    Build runs one native builder per shard in a thread pool (the C ABI
    releases the GIL, so shard builds use all host cores — the reference's
    build loop is strictly serial, index_builder/build.cpp:137-145).
    """

    def __init__(
        self,
        space: Space | str,
        dim: int | None = None,
        *,
        mesh: Mesh,
        shard_axis: str = "shard",
        dp_axis: str | None = None,
        m: int = 16,
        ef_construction: int = 200,
        seed: int = 123,
    ):
        if isinstance(space, str):
            space = get_space(space, dim)
        self.space = space
        self.dim = space.dim
        self.mesh = mesh
        self.shard_axis = shard_axis
        self.dp_axis = dp_axis
        self.num_shards = mesh.shape[shard_axis]
        self.m = m
        self.ef_construction = ef_construction
        self.seed = seed
        self._builders = None
        self._shard_labels: list[np.ndarray] | None = None  # per-shard labels
        self._shard_deleted: list[np.ndarray] | None = None  # per-shard bool
        self._label_map: dict[int, tuple[int, int]] | None = None  # label -> (shard, local)
        self._arrays: ShardedIndexArrays | None = None

    def build(self, data: np.ndarray, labels: np.ndarray | None = None) -> None:
        from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder

        data = self.space.preprocess(data)
        n = data.shape[0]
        if labels is None:
            labels = np.arange(n, dtype=np.int64)
        labels = np.asarray(labels, dtype=np.int64)
        s = self.num_shards
        # round-robin partition keeps shards balanced for any input order
        parts = [np.arange(i, n, s) for i in range(s)]

        def build_one(i):
            b = NativeHNSWBuilder(
                self.dim, self.space.name, self.m, self.ef_construction,
                self.seed + i,
            )
            b.add_batch(data[parts[i]], labels[parts[i]])
            return b

        with concurrent.futures.ThreadPoolExecutor(max_workers=s) as ex:
            self._builders = list(ex.map(build_one, range(s)))
        self._reindex_labels()
        self._rebuild_arrays()

    def _reindex_labels(self) -> None:
        """Rebuild the per-shard label tables and the label -> (shard, local)
        map from the builders (single-chip feature parity: filters, deletes
        and entry overrides address elements by external label)."""
        self._shard_labels = []
        self._shard_deleted = []
        self._label_map = {}
        for i, b in enumerate(self._builders):
            g = b.export_graph()
            self._shard_labels.append(g.labels.copy())
            self._shard_deleted.append(b.export_deleted().astype(bool))
            for local, lab in enumerate(g.labels):
                self._label_map[int(lab)] = (i, local)

    def _rebuild_arrays(self) -> None:
        shards = [
            (b.export_graph(), b.export_vectors()) for b in self._builders
        ]
        self._arrays = build_sharded_arrays(
            shards, self.space, self.mesh, self.shard_axis
        )

    @property
    def arrays(self) -> ShardedIndexArrays:
        assert self._builders is not None, "call build() first"
        if self._arrays is None:
            self._rebuild_arrays()
        return self._arrays

    # -- mutation (single-chip parity: add/delete by external label) --------

    def add_items(self, data: np.ndarray, labels: np.ndarray | None = None) -> None:
        """Incremental insert: rows are distributed to the smallest shards
        (keeps the round-robin balance); device arrays re-stack lazily on the
        next search."""
        assert self._builders is not None, "call build() first"
        data = self.space.preprocess(data)
        if labels is None:
            start = sum(b.size for b in self._builders)
            labels = np.arange(start, start + data.shape[0], dtype=np.int64)
        labels = np.asarray(labels, dtype=np.int64).reshape(-1)
        sizes = np.asarray([b.size for b in self._builders])
        # assign items round-robin starting from the currently smallest shards
        rank = np.argsort(sizes, kind="stable")
        shard_of = rank[np.arange(data.shape[0]) % self.num_shards]
        for i in range(self.num_shards):
            sel = shard_of == i
            if not sel.any():
                continue
            first_local = self._builders[i].size
            self._builders[i].add_batch(data[sel], labels[sel])
            labs = labels[sel]
            self._shard_labels[i] = np.concatenate([self._shard_labels[i], labs])
            self._shard_deleted[i] = np.concatenate(
                [self._shard_deleted[i], np.zeros(len(labs), bool)]
            )
            for off, lab in enumerate(labs):
                self._label_map[int(lab)] = (i, first_local + off)
        self._arrays = None  # re-stack lazily

    def mark_deleted(self, label: int) -> None:
        loc = self._label_map.get(int(label))
        if loc is None:
            raise KeyError(f"label {label} not in index")
        shard, local = loc
        self._builders[shard].mark_deleted(label)
        self._shard_deleted[shard][local] = True

    def unmark_deleted(self, label: int) -> None:
        loc = self._label_map.get(int(label))
        if loc is None:
            raise KeyError(f"label {label} not in index")
        shard, local = loc
        self._builders[shard].unmark_deleted(label)
        self._shard_deleted[shard][local] = False

    @property
    def num_elements(self) -> int:
        return sum(b.size for b in self._builders)

    # -- persistence ---------------------------------------------------------

    def save(self, path_prefix: str) -> None:
        """Write one native checkpoint per shard: {prefix}.shard{i}.npz +
        {prefix}.meta.json."""
        import json

        assert self._builders is not None, "nothing built"
        for i, b in enumerate(self._builders):
            from hnsw_tpu.io.checkpoint import save_checkpoint

            save_checkpoint(
                f"{path_prefix}.shard{i}.npz",
                b.export_graph(),
                b.export_vectors(),
                b.export_deleted(),
                meta={"space": self.space.persist_name, "dim": self.dim, "m": self.m},
            )
        with open(f"{path_prefix}.meta.json", "w") as f:
            json.dump(
                {
                    "num_shards": self.num_shards,
                    "space": self.space.persist_name,
                    "dim": self.dim,
                    "m": self.m,
                    "ef_construction": self.ef_construction,
                },
                f,
            )

    def load(self, path_prefix: str) -> None:
        """Restore builders + device arrays from a save()d checkpoint set
        (shard count must match this index's mesh)."""
        import json

        from hnsw_tpu.io.checkpoint import load_checkpoint
        from hnsw_tpu.native.hnsw_builder import NativeHNSWBuilder

        with open(f"{path_prefix}.meta.json") as f:
            meta = json.load(f)
        assert meta["num_shards"] == self.num_shards, (
            f"checkpoint has {meta['num_shards']} shards, mesh has {self.num_shards}"
        )
        self._builders = []
        shards = []
        for i in range(self.num_shards):
            g, vectors, deleted, _ = load_checkpoint(f"{path_prefix}.shard{i}.npz")
            b = NativeHNSWBuilder.from_graph(
                g, vectors, deleted, space=self.space.name,
                ef_construction=meta["ef_construction"],
            )
            self._builders.append(b)
            shards.append((g, vectors))
        self._arrays = build_sharded_arrays(
            shards, self.space, self.mesh, self.shard_axis
        )
        self._reindex_labels()

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        ef: int = 200,
        expand: int = 1,
        *,
        filter_labels: np.ndarray | None = None,
        entry_labels: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched kNN over all shards (single-chip parity features:
        `filter_labels` is a bool mask over external labels, delete-marked
        elements are always excluded, `entry_labels` optionally overrides the
        per-query entry point by external label — each shard maps the label
        to its local id or falls back to its own entry point)."""
        q_np = self.space.preprocess(queries)
        b0 = q_np.shape[0]
        # pad so each dp-local batch is a multiple of the hop-kernel tile
        unit = 16 * (self.mesh.shape[self.dp_axis] if self.dp_axis else 1)
        b_pad = ((b0 + unit - 1) // unit) * unit
        if b_pad != b0:
            q_np = np.concatenate(
                [q_np, np.zeros((b_pad - b0, self.dim), np.float32)]
            )

        arrays = self.arrays
        s = self.num_shards
        n_pad = arrays.level0.shape[1]
        any_deleted = any(d.any() for d in self._shard_deleted)
        has_mask = any_deleted or filter_labels is not None
        if has_mask:
            elig = np.ones((s, n_pad), dtype=bool)
            for i in range(s):
                n_i = len(self._shard_deleted[i])
                ok = ~self._shard_deleted[i]
                if filter_labels is not None:
                    ok = ok & np.asarray(filter_labels, dtype=bool)[
                        self._shard_labels[i]
                    ]
                elig[i, :n_i] = ok
            eligible = jnp.asarray(elig)
        else:
            eligible = jnp.ones((s, 1), dtype=bool)

        has_entry = entry_labels is not None
        if has_entry:
            ent = np.full((s, b_pad), -1, dtype=np.int32)
            for j, lab in enumerate(np.asarray(entry_labels).reshape(-1)):
                loc = self._label_map.get(int(lab))
                if loc is not None:
                    ent[loc[0], j] = loc[1]
            entry_ids = jnp.asarray(ent)
        else:
            entry_ids = jnp.zeros((s, 1), dtype=jnp.int32)

        d, l = sharded_search(
            arrays,
            jnp.asarray(q_np),
            eligible,
            entry_ids,
            k=k,
            ef=max(ef, k),
            space=self.space.name,
            expand=expand,
            mesh=self.mesh,
            dp_axis=self.dp_axis,
            shard_axis=self.shard_axis,
            has_mask=has_mask,
            has_entry=has_entry,
        )
        return np.asarray(d)[:b0], np.asarray(l)[:b0]
