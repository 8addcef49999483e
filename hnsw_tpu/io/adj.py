"""`.adj` adjacency-format import/export, byte-compatible with the reference.

Format (reference: index_builder/build.cpp:14-21, writer at 22-107; loader at
hnsw_service/hnsw_graph.cpp:14-151), all little-endian uint32:

    header:  entrypoint, max_level, node_count
    per node (in internal-id order):
        label
        levels            (= top level + 1)
        per level 0..top:
            deg
            deg x neighbor internal ids

An index exported by the reference's `index_builder` loads here, and a graph
exported here loads in the reference's `hnsw_service` optimized mode.
"""

from __future__ import annotations

import numpy as np

from hnsw_tpu.core.graph import HNSWGraph


def write_adj(g: HNSWGraph, path: str) -> None:
    n = g.num_nodes
    chunks: list[np.ndarray] = [
        np.asarray([max(g.entry_point, 0), max(g.max_level, 0), n], dtype="<u4")
    ]
    for node in range(n):
        top = int(g.node_level[node])
        head = np.asarray([int(g.labels[node]) & 0xFFFFFFFF, top + 1], dtype="<u4")
        chunks.append(head)
        for level in range(top + 1):
            nbrs = g.neighbors(node, level).astype("<u4")
            chunks.append(np.asarray([nbrs.size], dtype="<u4"))
            if nbrs.size:
                chunks.append(nbrs)
    with open(path, "wb") as f:
        f.write(np.concatenate(chunks).tobytes())


def read_adj(path: str, max_m: int | None = None) -> HNSWGraph:
    """Load an `.adj` file into a padded-CSR HNSWGraph.

    `max_m`: upper-level padding width; defaults to the max upper degree
    found (level-0 width defaults to the max level-0 degree found).
    """
    raw = np.fromfile(path, dtype="<u4")
    entry, max_level, n = int(raw[0]), int(raw[1]), int(raw[2])
    pos = 3

    labels = np.zeros(n, dtype=np.int64)
    node_level = np.zeros(n, dtype=np.int32)
    per_node: list[list[np.ndarray]] = []
    for node in range(n):
        labels[node] = int(raw[pos])
        levels = int(raw[pos + 1])
        pos += 2
        node_level[node] = levels - 1
        lists = []
        for _ in range(levels):
            deg = int(raw[pos])
            pos += 1
            lists.append(raw[pos : pos + deg].astype(np.int32))
            pos += deg
        per_node.append(lists)

    max_m0 = max((len(l[0]) for l in per_node), default=1) or 1
    upper_degs = [len(l[lv]) for l in per_node for lv in range(1, len(l))]
    m = max_m if max_m is not None else (max(upper_degs, default=1) or 1)

    level0 = np.full((n, max_m0), -1, dtype=np.int32)
    for node, lists in enumerate(per_node):
        nb = lists[0]
        level0[node, : len(nb)] = nb

    ml = max_level
    if ml > 0:
        counts = [int(np.sum(node_level >= l)) for l in range(1, ml + 1)]
        u_max = max(counts) if counts else 1
        upper = np.full((ml, u_max, m), -1, dtype=np.int32)
        upper_slot = np.full((ml, n), -1, dtype=np.int32)
        slot_ctr = [0] * ml
        for node, lists in enumerate(per_node):
            for lv in range(1, len(lists)):
                s = slot_ctr[lv - 1]
                slot_ctr[lv - 1] += 1
                upper_slot[lv - 1, node] = s
                nb = lists[lv][:m]
                upper[lv - 1, s, : len(nb)] = nb
    else:
        upper = np.zeros((0, 1, 1), dtype=np.int32)
        upper_slot = np.zeros((0, n), dtype=np.int32)

    return HNSWGraph(
        level0=level0,
        upper=upper,
        upper_slot=upper_slot,
        node_level=node_level,
        labels=labels,
        entry_point=entry,
        max_level=ml,
    )
