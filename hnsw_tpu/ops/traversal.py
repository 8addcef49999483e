"""Batched HNSW graph traversal — the flagship device kernel.

The reference's query path (hnswlib::HierarchicalNSW::searchKnn,
hnswlib/hnswalg.h:1271-1324) is a serial pointer-chase: greedy 1-best descent
over upper layers (1278-1303), then a heap-driven best-first beam over level 0
(searchBaseLayerST, 311-440) with an epoch-tagged visited array
(visited_list_pool.h). None of that maps to a TPU.

This module re-expresses it as a *batched, fixed-shape, masked* program under
`jit`:

- A whole batch B of queries traverses simultaneously.
- The beam is a sorted (ascending distance) array of `ef` (id, dist, expanded)
  triples per query. One traversal step expands the `expand` best unexpanded
  entries, gathers their level-0 neighbor lists (one HBM gather), computes all
  neighbor distances as one batched contraction (MXU), and merges candidates
  back into the beam with a length-(ef + expand*maxM0) sort.
- The visited set is a per-query byte vector in HBM ([B, N_pad] uint8),
  written with one scatter per step — replacing the reference's pooled
  epoch arrays (hnswlib/visited_list_pool.h:10-77).
- Termination is per-query (no unexpanded beam entry) inside one global
  `lax.while_loop`; finished queries become no-ops via masking.

Because every candidate is marked visited when it *enters* the beam, the beam
never holds duplicates, so the final beam prefix is exactly top-k.

Filtering (BaseFilterFunctor semantics, hnswlib/hnswlib.h:128-132) and
delete-marks (hnswalg.h:853-900) are an `eligible` mask over node ids:
ineligible nodes are traversed but collected into the result list — a separate
sorted (id, dist) array maintained only when a mask is passed — exactly the
reference's searchBaseLayerST behavior for deleted/filtered points.

Per-query hop and distance-computation counters (the reference's
metric_hops / metric_distance_computations, hnswalg.h:65-66) are carried in
the loop state and returned when `collect_metrics=True`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hnsw_tpu.core.graph import DeviceGraph
from hnsw_tpu.ops.distance import gather_dist

Array = jax.Array

_INF = jnp.inf


class SearchResults(NamedTuple):
    dists: Array  # [B, k] f32, ascending (inf for missing)
    ids: Array  # [B, k] int32 internal ids (>= num_nodes for missing)
    hops: Array  # [B] int32 (zeros unless collect_metrics)
    dist_comps: Array  # [B] int32 (zeros unless collect_metrics)


# ---------------------------------------------------------------------------
# Upper-layer greedy descent (reference: hnswalg.h:1278-1303).
# ---------------------------------------------------------------------------


def _greedy_descent_level(
    q: Array,  # [B, D]
    vectors: Array,  # [N_pad, D]
    sq_norms: Array | None,
    nbr_table: Array,  # [U_pad, M] neighbor ids at this level
    slot_map: Array,  # [N_pad] node id -> slot
    cur: Array,  # [B] int32
    cur_d: Array,  # [B] f32
    num_nodes: Array,
    space: str,
) -> tuple[Array, Array]:
    """Batched greedy 1-best walk on one upper level until no query improves."""

    def cond(state):
        _, _, improved = state
        return jnp.any(improved)

    def body(state):
        cur, cur_d, _ = state
        slots = jnp.take(slot_map, cur, axis=0)  # [B]
        nbrs = jnp.take(nbr_table, slots, axis=0)  # [B, M]
        valid = nbrs < num_nodes
        safe = jnp.where(valid, nbrs, 0)
        d = gather_dist(q, vectors, safe, space, x_sq_norms=sq_norms)
        d = jnp.where(valid, d, _INF)
        best = jnp.argmin(d, axis=-1)  # [B]
        best_d = jnp.take_along_axis(d, best[:, None], axis=-1)[:, 0]
        best_id = jnp.take_along_axis(nbrs, best[:, None], axis=-1)[:, 0]
        improved = best_d < cur_d
        cur = jnp.where(improved, best_id, cur)
        cur_d = jnp.where(improved, best_d, cur_d)
        return cur, cur_d, improved

    init = (cur, cur_d, jnp.ones(cur.shape, dtype=bool))
    cur, cur_d, _ = jax.lax.while_loop(cond, body, init)
    return cur, cur_d


# ---------------------------------------------------------------------------
# Level-0 batched beam search (reference: hnswalg.h:311-440).
# ---------------------------------------------------------------------------


class _BeamState(NamedTuple):
    beam_d: Array  # [B, ef] ascending
    beam_id: Array  # [B, ef]
    beam_exp: Array  # [B, ef] bool
    res_d: Array  # [B, ef] (filtered results; unused when no mask)
    res_id: Array  # [B, ef]
    visited: Array  # [B, N_pad] uint8 (bitpacked later rounds)
    hops: Array  # [B] int32
    dist_comps: Array  # [B] int32
    it: Array  # [] int32


def _sort_beam(d: Array, i: Array, e: Array, ef: int):
    """Sort (dist, id) lexicographically, carry expanded flags; keep first ef."""
    d, i, e = jax.lax.sort((d, i, e), dimension=-1, num_keys=2)
    return d[..., :ef], i[..., :ef], e[..., :ef]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k",
        "ef",
        "expand",
        "space",
        "max_iters",
        "collect_metrics",
        "has_mask",
    ),
)
def search_batch(
    vectors: Array,  # [N_pad, D]
    graph: DeviceGraph,
    queries: Array,  # [B, D]
    *,
    k: int,
    ef: int,
    space: str = "l2",
    sq_norms: Array | None = None,
    eligible: Array | None = None,  # [N_pad] bool; None => all eligible
    entry_ids: Array | None = None,  # [B] int32 per-query entry override
    expand: int = 1,
    max_iters: int = 0,  # 0 => default 2*ef + 16
    collect_metrics: bool = False,
    has_mask: bool = False,
) -> SearchResults:
    """Batched HNSW search over a device-resident padded-CSR graph.

    Functional equivalent of HierarchicalNSW::searchKnn
    (hnswlib/hnswalg.h:1271-1324) for a batch of queries: greedy upper-layer
    descent then fixed-ef beam search at level 0. `ef >= k` required.
    """
    assert ef >= k, "ef must be >= k"
    if max_iters <= 0:
        max_iters = 2 * ef + 16
    b, _ = queries.shape
    n_pad, max_m0 = graph.level0.shape
    num_nodes = graph.num_nodes
    q = queries

    use_mask = has_mask and eligible is not None
    if eligible is None:
        eligible = jnp.ones((1,), dtype=bool)  # placeholder, unused

    # ---- entry ------------------------------------------------------------
    if entry_ids is None:
        cur = jnp.broadcast_to(graph.entry_point, (b,)).astype(jnp.int32)
    else:
        cur = entry_ids.astype(jnp.int32)
    # Guard invalid entry (empty graph / bad override): park on the dummy row
    # with inf distance so it can never win a merge.
    ent_ok = (cur >= 0) & (cur < num_nodes)
    cur = jnp.where(ent_ok, cur, n_pad - 1)
    cur_d = gather_dist(q, vectors, cur[:, None], space, x_sq_norms=sq_norms)[:, 0]
    cur_d = jnp.where(ent_ok, cur_d, _INF)

    # ---- upper layers (static python loop over levels; shapes static) -----
    for level in range(graph.max_level, 0, -1):
        cur, cur_d = _greedy_descent_level(
            q,
            vectors,
            sq_norms,
            graph.upper[level - 1],
            graph.upper_slot[level - 1],
            cur,
            cur_d,
            num_nodes,
            space,
        )

    # ---- level-0 beam ------------------------------------------------------
    sent_d = jnp.float32(_INF)
    beam_d = jnp.full((b, ef), sent_d)
    beam_id = jnp.full((b, ef), n_pad - 1, dtype=jnp.int32)
    beam_exp = jnp.zeros((b, ef), dtype=bool)
    beam_d = beam_d.at[:, 0].set(cur_d)
    beam_id = beam_id.at[:, 0].set(cur)

    res_d = jnp.full((b, ef), sent_d)
    res_id = jnp.full((b, ef), n_pad - 1, dtype=jnp.int32)
    if use_mask:
        ent_ok = jnp.take(eligible, cur, axis=0)
        res_d = res_d.at[:, 0].set(jnp.where(ent_ok, cur_d, _INF))
        res_id = res_id.at[:, 0].set(jnp.where(ent_ok, cur, n_pad - 1))

    visited = jnp.zeros((b, n_pad), dtype=jnp.uint8)
    visited = visited.at[jnp.arange(b), cur].set(1)

    rows = jnp.arange(b, dtype=jnp.int32)[:, None]  # [B, 1]

    def cond(st: _BeamState):
        unexp = (~st.beam_exp) & (st.beam_d < _INF)
        return jnp.logical_and(st.it < max_iters, jnp.any(unexp))

    def body(st: _BeamState):
        unexp = (~st.beam_exp) & (st.beam_d < _INF)
        active = jnp.any(unexp, axis=-1)  # [B]
        # Pick `expand` best unexpanded entries (beam is sorted, so the
        # smallest keys win). key=inf where expanded/invalid.
        key = jnp.where(unexp, st.beam_d, _INF)
        _, sel = jax.lax.top_k(-key, expand)  # [B, E] positions in beam
        sel_valid = jnp.take_along_axis(unexp, sel, axis=-1)  # [B, E]
        chosen = jnp.take_along_axis(st.beam_id, sel, axis=-1)  # [B, E]
        chosen = jnp.where(sel_valid, chosen, n_pad - 1)
        beam_exp = st.beam_exp.at[rows[:, 0][:, None], sel].max(sel_valid)

        # Gather neighbor lists: one HBM gather of E rows per query.
        nbrs = jnp.take(graph.level0, chosen, axis=0)  # [B, E, M0]
        nbrs = nbrs.reshape(b, expand * max_m0)
        in_range = nbrs < num_nodes
        # Visited-check + mark, sequentially over the E groups so that a
        # neighbor shared by two expanded nodes is admitted exactly once
        # (within one group ids are unique by graph invariant).
        visited = st.visited
        if expand == 1:
            seen = jnp.take_along_axis(visited, jnp.where(in_range, nbrs, 0), axis=-1)
            fresh = in_range & (seen == 0) & active[:, None]
            visited = visited.at[rows, nbrs].max(fresh.astype(jnp.uint8))
        else:
            fresh_groups = []
            for e in range(expand):
                sl = slice(e * max_m0, (e + 1) * max_m0)
                nb_e = nbrs[:, sl]
                ir_e = in_range[:, sl]
                seen = jnp.take_along_axis(visited, jnp.where(ir_e, nb_e, 0), axis=-1)
                f_e = ir_e & (seen == 0) & active[:, None]
                visited = visited.at[rows, nb_e].max(f_e.astype(jnp.uint8))
                fresh_groups.append(f_e)
            fresh = jnp.concatenate(fresh_groups, axis=-1)

        safe = jnp.where(fresh, nbrs, 0)
        d = gather_dist(q, vectors, safe, space, x_sq_norms=sq_norms)
        d = jnp.where(fresh, d, _INF)
        cand_id = jnp.where(fresh, nbrs, n_pad - 1)

        # Merge into beam.
        md = jnp.concatenate([st.beam_d, d], axis=-1)
        mi = jnp.concatenate([st.beam_id, cand_id], axis=-1)
        me = jnp.concatenate([beam_exp, jnp.zeros_like(fresh)], axis=-1)
        beam_d, beam_id2, beam_exp2 = _sort_beam(md, mi, me, ef)

        if use_mask:
            ok = jnp.take(eligible, safe, axis=0) & fresh
            rd = jnp.where(ok, d, _INF)
            ri = jnp.where(ok, nbrs, n_pad - 1)
            rmd = jnp.concatenate([st.res_d, rd], axis=-1)
            rmi = jnp.concatenate([st.res_id, ri], axis=-1)
            rmd, rmi = jax.lax.sort((rmd, rmi), dimension=-1, num_keys=2)
            res_d2, res_id2 = rmd[:, :ef], rmi[:, :ef]
        else:
            res_d2, res_id2 = st.res_d, st.res_id

        if collect_metrics:
            hops = st.hops + active.astype(jnp.int32)
            dist_comps = st.dist_comps + jnp.sum(fresh, axis=-1).astype(jnp.int32)
        else:
            hops, dist_comps = st.hops, st.dist_comps

        return _BeamState(
            beam_d, beam_id2, beam_exp2, res_d2, res_id2, visited, hops, dist_comps,
            st.it + 1,
        )

    init = _BeamState(
        beam_d,
        beam_id,
        beam_exp,
        res_d,
        res_id,
        visited,
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)

    if use_mask:
        out_d, out_i = final.res_d[:, :k], final.res_id[:, :k]
    else:
        out_d, out_i = final.beam_d[:, :k], final.beam_id[:, :k]
    return SearchResults(out_d, out_i, final.hops, final.dist_comps)
