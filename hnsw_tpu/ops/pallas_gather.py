"""Pallas TPU kernel: fused gather-rows + distance.

The traversal's hot op is "fetch K neighbor vectors per query, compute K
distances" (reference inner loop: hnswlib/hnswalg.h:377-435). XLA lowers the
row gather to a serial ~100ns/row stream — memory-latency bound, and the
single biggest cost in the whole query path. This kernel instead issues all
rows of a (TB queries x K neighbors) tile as concurrent async DMAs
(HBM -> VMEM), hiding HBM latency across hundreds of in-flight copies, then
computes squared-L2 / IP distances on the tile with one batched contraction.

x_sq_norms are not needed: ||x||^2 is recomputed on the VPU from the gathered
rows (flops are free here; bytes are not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _normalize_tb(tb: int, b: int) -> int:
    """Clamp a user-supplied hop-kernel query tile to a power of two that
    divides the batch (batches are padded to multiples of 16 upstream — a
    non-power-of-two tb like 12 would halve to 6 and fail the >=8 floor)."""
    tb = min(tb, b)
    if tb & (tb - 1):
        tb = 1 << (tb.bit_length() - 1)
    while b % tb != 0 and tb > 8:
        tb //= 2
    assert tb >= 8 and b % tb == 0, f"batch {b} must be a multiple of tb>=8"
    return tb


def _gather_dist_kernel(ids_ref, q_ref, table_ref, out_ref, rows, sems, *, tb, k, ip):
    base = pl.program_id(0) * tb
    # Issue one DMA per (query, neighbor) row — all concurrent — then wait.
    # ONE shared semaphore for all tb*k copies (DMA sems count bytes, so
    # per-copy waits pair up): a per-copy sems array overflows the 2KB
    # sflag space at tb*k > 512 (hit at the rescore m=100 operating point).
    def _dma(t, j):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[base + t, j]], rows.at[t * k + j], sems
        )

    for t in range(tb):
        for j in range(k):
            _dma(t, j).start()
    for t in range(tb):
        for j in range(k):
            _dma(t, j).wait()

    r = rows[:]  # [tb*k, d]
    q = q_ref[:]  # [tb, d]
    qx = jax.lax.dot_general(
        r.reshape(tb, k, r.shape[-1]),
        q,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [tb, k]
    if ip:
        out_ref[:] = 1.0 - qx
    else:
        x2 = jnp.sum(r.astype(jnp.float32) * r, axis=-1).reshape(tb, k)
        q2 = jnp.sum(q.astype(jnp.float32) * q, axis=-1)[:, None]
        out_ref[:] = jnp.maximum(q2 + x2 - 2.0 * qx, 0.0)


def _gather_dist_kernel_pair(
    ids_ref, q_ref, table_ref, out_ref, rows, sems, *, tb, k, ip
):
    """bf16-table variant of _gather_dist_kernel: Mosaic rejects single
    sublane-row DMAs from a (16,128)-tiled bf16 table, so copy the aligned
    row PAIR containing each id (2 sublanes, 512B — the same bytes per
    descriptor as one f32 row) and emit distances for both pair members;
    the caller selects by id parity. The table arrives reshaped [N//2, 2, d]
    and ids_ref holds PAIR indices (id >> 1): leading-dim slices of a 3D
    array don't intersect the (8,128)(2,1) packed tiling — a dynamic-start
    2-sublane slice of the 2D table is rejected by Mosaic."""
    base = pl.program_id(0) * tb

    def _dma(t, j):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[base + t, j]], rows.at[t * k + j], sems
        )

    for t in range(tb):
        for j in range(k):
            _dma(t, j).start()
    for t in range(tb):
        for j in range(k):
            _dma(t, j).wait()

    d = q_ref.shape[-1]
    # VPU elementwise like the hop kernel (a bf16 batched dot_general here
    # crashes the Mosaic compile helper; at this arithmetic intensity the
    # kernel is DMA-bound anyway)
    r32 = rows[:].reshape(tb, 2 * k, d).astype(jnp.float32)
    q32 = q_ref[:].astype(jnp.float32)[:, None, :]  # [tb, 1, d]
    if ip:
        out_ref[:] = 1.0 - jnp.sum(r32 * q32, axis=-1)
    else:
        diff = r32 - q32
        out_ref[:] = jnp.sum(diff * diff, axis=-1)


def _hop_dist_kernel(
    chosen_ref,  # SMEM scalar-prefetch [ceil(B*E/128), 128] (lane-packed)
    q_ref,  # VMEM [tb, d]
    nbrvec_ref,  # ANY/HBM [N_pad, m0, d] bf16
    l0t_ref,  # ANY/HBM [ceil(N_pad/32), 8, 128] int32 tiled level-0 ids
    out_ref,  # VMEM [tb, e*m0] f32
    ids_out_ref,  # VMEM [tb, e, 8, 128] int32 (raw tiles; XLA extracts)
    rows,  # VMEM scratch [2, tb*e, m0, d] bf16 (double-buffered)
    idt,  # VMEM scratch [2, tb*e, 8, 128] int32
    sems,  # DMA sems [2]
    id_sems,  # DMA sems [2]
    *,
    tb,
    e,
    m0,
    d,
    ip,
):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    em = e * m0

    def issue(s, buf):
        base = s * tb * e
        for t in range(tb):
            for j in range(e):
                f = base + t * e + j
                c = chosen_ref[f // 128, f % 128]
                pltpu.make_async_copy(
                    nbrvec_ref.at[c], rows.at[buf, t * e + j], sems.at[buf]
                ).start()
                pltpu.make_async_copy(
                    l0t_ref.at[c // 32], idt.at[buf, t * e + j], id_sems.at[buf]
                ).start()

    @pl.when(step == 0)
    def _():
        issue(0, 0)

    @pl.when(step + 1 < nsteps)
    def _():
        issue(step + 1, (step + 1) % 2)

    buf = step % 2
    # One wait per scratch: DMA semaphores count bytes, and these
    # descriptors' sizes equal the sums of the row transfers above.
    pltpu.make_async_copy(nbrvec_ref.at[0], rows.at[buf], sems.at[buf]).wait()
    pltpu.make_async_copy(l0t_ref.at[0], idt.at[buf], id_sems.at[buf]).wait()
    ids_out_ref[:] = idt[buf].reshape(tb, e, 8, 128)

    # Distances on the VPU: elementwise (r - q)^2 lane-reduced. An MXU
    # formulation ([tb*em, d] x [tb, d]^T + one-hot diagonal pick) was 3x
    # slower end-to-end — it does a factor-tb of wasted flops, and at this
    # arithmetic intensity the kernel is DMA/VPU-bound anyway.
    r32 = rows[buf].reshape(tb, em, d).astype(jnp.float32)
    q32 = q_ref[:].astype(jnp.float32)[:, None, :]  # [tb, 1, d]
    if ip:
        out_ref[:] = 1.0 - jnp.sum(r32 * q32, axis=-1)
    else:
        diff = r32 - q32
        out_ref[:] = jnp.sum(diff * diff, axis=-1)


@functools.partial(jax.jit, static_argnames=("space", "m0", "tb", "interpret"))
def hop_dist_inline(
    q: Array,  # [B, D]
    nbr_vectors: Array,  # [N_pad, M0, D] bf16 — node i's M0 neighbors' vectors
    level0_tiles: Array,  # [ceil(N_pad/32), 8, 128] int32 tiled adjacency
    chosen: Array,  # [B, E] int32 node ids to expand (in-range)
    m0: int,
    space: str = "l2",
    tb: int = 16,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Expand `chosen` nodes: one contiguous 8-16KB DMA per (query, chosen)
    for the inline neighbor vectors plus one 4KB DMA for the adjacency tile,
    instead of M0+1 random row reads — the descriptor-issue-bound gather
    becomes bandwidth-bound.

    Returns (dists [B, E*M0] f32, id_tiles [B, E, 8, 128] int32). Each
    chosen node's M0 neighbor ids live somewhere inside its raw 32-node
    tile; extract with `extract_level0_ids` (dense VPU ops, no gathers).
    """
    b, d = q.shape
    e = chosen.shape[1]
    d_pad = nbr_vectors.shape[2]
    assert nbr_vectors.shape[1] == m0 and d_pad >= d and d_pad % 128 == 0
    if d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, d_pad - d)))
        d = d_pad
    tb = _normalize_tb(tb, b)
    grid = (b // tb,)
    # Lane-pack the ids: a [B, E] scalar-prefetch operand is padded to 128
    # lanes per row in SMEM (1 MB at B=2048) and overflows; [P, 128] wastes
    # at most one row.
    flat = chosen.reshape(-1)
    p = -(-flat.shape[0] // 128)
    flat = jnp.pad(flat, (0, p * 128 - flat.shape[0]))
    chosen_packed = flat.reshape(p, 128)
    kernel = functools.partial(
        _hop_dist_kernel, tb=tb, e=e, m0=m0, d=d, ip=space == "ip"
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(
                    (tb, e * m0), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tb, e, 8, 128),
                    lambda i, ids: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, tb * e, m0, d), nbr_vectors.dtype),
                pltpu.VMEM((2, tb * e, 8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, e * m0), jnp.float32),
            jax.ShapeDtypeStruct((b, e, 8, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(chosen_packed, q, nbr_vectors, level0_tiles)


def make_level0_tiles(level0: Array) -> Array:
    """Pack the [N_pad, maxM0] level-0 adjacency into DMA-aligned int32
    tiles [ceil(N_pad/32), 8, 128]: node n's ids live in tile n//32 at
    sublane (n%32)//4, lanes (n%4)*32 .. +maxM0. Requires maxM0 <= 32.
    Zero memory overhead: exactly N_pad*128 bytes either way."""
    n_pad, m0 = level0.shape
    assert m0 <= 32, "tiled layout supports maxM0 <= 32"
    # pad columns with the sentinel (n_pad-1 = guaranteed dummy row), NOT 0:
    # 0 is a real node id
    rows = jnp.pad(level0, ((0, (-n_pad) % 32), (0, 32 - m0)),
                   constant_values=n_pad - 1)
    t = rows.shape[0] // 32
    return rows.reshape(t, 8, 4 * 32).astype(jnp.int32)


def extract_level0_ids(id_tiles: Array, chosen: Array, m0: int) -> Array:
    """id_tiles [B, E, 8, 128] (raw tiles from hop_dist_inline), chosen
    [B, E] → neighbor ids [B, E*M0], via one-hot reduces (no gathers)."""
    b, e = chosen.shape
    w = chosen % 32
    sub = w // 4  # [B, E]
    lg = w % 4
    sub_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2) == sub[:, :, None]
    )  # [B, E, 8]
    rows = jnp.sum(
        jnp.where(sub_oh[..., None], id_tiles, 0), axis=2
    )  # [B, E, 128]
    rows4 = rows.reshape(b, e, 4, 32)
    lg_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 4), 2) == lg[:, :, None]
    )  # [B, E, 4]
    ids = jnp.sum(jnp.where(lg_oh[..., None], rows4, 0), axis=2)  # [B, E, 32]
    return ids[:, :, :m0].reshape(b, e * m0)


# ---------------------------------------------------------------------------
# Unified node-block rows: ids + bf16-packed neighbor vectors in ONE DMA per
# expansion (halves the descriptor count vs the split inline-table + id-tile
# design; descriptor issue is the loop's bound at ~100ns each). Verified on
# v5e: pltpu.bitcast(int32[..., s, 128] -> bf16) unpacks sublane i into bf16
# sublanes 2i (low half) / 2i+1 (high half), the exact inverse of
# lax.bitcast_convert_type packing pairs along a trailing axis.
# ---------------------------------------------------------------------------


def unified_row_sublanes(m0: int, d_pad: int) -> tuple[int, int]:
    """(vector sublanes sv, total row sublanes s_data) of a unified node
    block: sv int32 sublanes of packed bf16 vectors + 1 id sublane, with NO
    tile padding — the table is stored 2D [N_pad*s_data, 128] so rows pack
    dense on the sublane axis (a 3D [N, s, 128] table pads s up to the
    int32 tile height 8: 17 -> 24 sublanes = 41% wasted DMA bandwidth,
    measured -25% hop-kernel time from going dense). Requires
    m0*d_pad % 256 == 0 and m0 <= 128."""
    assert m0 * d_pad % 256 == 0 and m0 <= 128
    sv = m0 * d_pad // 256
    return sv, sv + 1


def pack_unified_rows(
    vectors: Array, nbr_ids: Array, sent: int, id_payload: Array | None = None
) -> Array:
    """Pack neighbor blocks [K, m0] -> unified rows [K, s_data, 128] int32:
    sublanes 0..sv-1 hold the m0 neighbors' bf16 vectors (P1 pair packing),
    sublane sv (the last) holds the m0 neighbor ids (sentinel-padded to 128
    lanes). Dense rows — reshape to [K*s_data, 128] for table storage.

    `id_payload` optionally substitutes what the id sublane carries (the
    upper-level tables store neighbor *slots* there while the vectors still
    come from node ids)."""
    k, m0 = nbr_ids.shape
    d = vectors.shape[1]
    d_pad = -(-d // 128) * 128
    sv, _ = unified_row_sublanes(m0, d_pad)
    # cast-then-gather: a f32 gather output is 2x the packed size (OOM at 1M)
    rows = jnp.take(vectors.astype(jnp.bfloat16), nbr_ids.reshape(-1), axis=0)
    if d_pad != d:
        rows = jnp.pad(rows, ((0, 0), (0, d_pad - d)))
    pairs = rows.reshape(k, sv, 2, 128).transpose(0, 1, 3, 2)  # [K, sv, 128, 2]
    packed = jax.lax.bitcast_convert_type(pairs, jnp.int32)  # [K, sv, 128]
    payload = nbr_ids if id_payload is None else id_payload
    ids_row = jnp.pad(
        payload.astype(jnp.int32), ((0, 0), (0, 128 - m0)), constant_values=sent
    )[:, None, :]
    return jnp.concatenate([packed, ids_row], axis=1)


# ---------------------------------------------------------------------------
# int8 unified node blocks: same one-DMA-per-expansion design at half the
# bf16 row size (m0=32/d=128: 9 sublanes = 4.6KB vs 17 = 8.7KB), which is
# what lets a 16GiB v5e serve N=2M. Per-vector symmetric quantization
# (scale = max|x|/127); the scale rides in the id sublane's spare lanes.
# Verified on v5e: pltpu.bitcast(int32[s,128] -> int8) unpacks sublane i
# into int8 sublanes 4i..4i+3, little-endian byte order — the inverse of
# lax.bitcast_convert_type packing 4 int8 along a trailing axis.
# ---------------------------------------------------------------------------


def unified8_row_sublanes(m0: int, d_pad: int) -> tuple[int, int]:
    """(vector int32 sublanes sv8, total row sublanes) of an int8 unified
    node block: m0*d_pad int8 codes packed 4-per-int32, + 1 id+scale
    sublane. Requires m0*d_pad % 512 == 0 and m0 <= 42 (ids and scales
    share the 128-lane id sublane: lanes 0..m0-1 ids, m0..2*m0-1 scales)."""
    assert m0 * d_pad % 512 == 0 and 2 * m0 <= 128
    sv8 = m0 * d_pad // 512
    return sv8, sv8 + 1


def quantize_int8(vectors: Array) -> tuple[Array, Array]:
    """Per-vector symmetric int8 quantization → (codes [N, D] int8,
    scales [N] f32). x ≈ codes * scale."""
    amax = jnp.max(jnp.abs(vectors.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    codes = jnp.clip(
        jnp.round(vectors.astype(jnp.float32) / scale[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scale.astype(jnp.float32)


def quantize_exact_i8(vectors: Array) -> tuple[Array, Array]:
    """Lossless int8 'quantization' for integer-valued data in [-128, 127]
    (the shifted-uint8 L2SpaceU8 path, reference L2SpaceI parity,
    hnswlib/space_l2.h:294-323): codes = round(x), scale = 1. The int8 hop
    kernel dequants codes*scale in f32, so served distances are EXACT —
    the unified8 tier becomes a half-byte-per-value lossless row format."""
    codes = jnp.clip(
        jnp.round(vectors.astype(jnp.float32)), -128, 127
    ).astype(jnp.int8)
    return codes, jnp.ones((vectors.shape[0],), jnp.float32)


def pack_unified8_rows(
    codes: Array,  # [N_pad, D_pad] int8 (pre-quantized, lane-padded)
    scales: Array,  # [N_pad] f32
    nbr_ids: Array,  # [K, m0]
    sent: int,
) -> Array:
    """Pack neighbor blocks into int8 unified rows [K, s8, 128] int32:
    sublanes 0..sv8-1 hold the m0 neighbors' int8 codes (4-per-int32),
    the last sublane holds ids (lanes 0..m0-1, sentinel-padded) and the
    neighbors' dequant scales as f32 bits (lanes m0..2m0-1)."""
    k, m0 = nbr_ids.shape
    d_pad = codes.shape[1]
    sv8, _ = unified8_row_sublanes(m0, d_pad)
    rows = jnp.take(codes, nbr_ids.reshape(-1), axis=0)  # [K*m0, d_pad]
    quads = rows.reshape(k, sv8, 4, 128).transpose(0, 1, 3, 2)  # [K,sv8,128,4]
    packed = jax.lax.bitcast_convert_type(quads, jnp.int32)  # [K, sv8, 128]
    s_rows = jnp.take(scales, nbr_ids.reshape(-1), axis=0).reshape(k, m0)
    s_bits = jax.lax.bitcast_convert_type(s_rows, jnp.int32)
    ids_row = jnp.full((k, 128), sent, jnp.int32)
    ids_row = jax.lax.dynamic_update_slice(
        ids_row, nbr_ids.astype(jnp.int32), (0, 0)
    )
    ids_row = jax.lax.dynamic_update_slice(ids_row, s_bits, (0, m0))
    return jnp.concatenate([packed, ids_row[:, None, :]], axis=1)


def make_unified8_table_chunked(
    vectors: Array, level0: Array, chunk: int = 1 << 17, exact: bool = False
) -> tuple[Array, Array, Array]:
    """Build the dense 2D int8 table [N_pad*s8, 128] plus the quantized
    (codes, scales) side tables (kept for delta refreshes and as the
    fallback distance source). Chunked donated accumulation bounds peak
    HBM exactly like the bf16 builders. `exact` uses the lossless scale-1
    codes of the shifted-uint8 space (quantize_exact_i8)."""
    import functools as _ft

    n_pad, m0 = level0.shape
    d = vectors.shape[1]
    d_pad = -(-d // 128) * 128
    sv8, s8 = unified8_row_sublanes(m0, d_pad)
    sent = n_pad - 1

    codes, scales = (quantize_exact_i8 if exact else quantize_int8)(vectors)
    if d_pad != d:
        codes = jnp.pad(codes, ((0, 0), (0, d_pad - d)))
    codes = jax.block_until_ready(codes)

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def upd(tab, cds, scl, lvl, start):
        rows = pack_unified8_rows(cds, scl, lvl, sent).reshape(-1, 128)
        return jax.lax.dynamic_update_slice(tab, rows, (start * s8, 0))

    tab = jnp.zeros((n_pad * s8, 128), jnp.int32)
    for s in range(0, n_pad, chunk):
        e = min(s + chunk, n_pad)
        tab = upd(tab, codes, scales, level0[s:e], jnp.int32(s))
    return jax.block_until_ready(tab), codes, scales


# ---------------------------------------------------------------------------
# int4 unified node blocks: the same one-DMA-per-expansion design at a
# QUARTER of the bf16 row (m0=32/d=128: 5 sublanes = 2.5KB vs 17 = 8.7KB),
# pushing per-chip capacity past the int8 tier's ~2M to ~3M+ on a 16GiB
# v5e. Per-vector symmetric 4-bit quantization (scale = max|x|/7) is coarse
# for final ranking but fine for BEAM NAVIGATION; the mandatory
# exact-rescore pass restores the ordering (measured: exhaustive search on
# int4-dequantized vectors + rescore-40 reproduces the exact f32 top-10 on
# clustered-gaussian data).
#
# Packing avoids any in-kernel relayout: nibble j of the int32 at (code
# sublane i, lane l) holds neighbor (j*sv4 + i)'s dim-l code, so the kernel
# unpacks with 8 shift-pairs and a SUBLANE CONCAT whose output order is
# exactly the natural neighbor order — ids and scales need no permutation.
# ---------------------------------------------------------------------------


def unified4_row_sublanes(m0: int, d_pad: int) -> tuple[int, int]:
    """(vector int32 sublanes sv4, total row sublanes) of an int4 unified
    node block: m0*d_pad 4-bit codes packed 8-per-int32, + 1 id+scale
    sublane (lanes 0..m0-1 ids, m0..2*m0-1 scales)."""
    assert m0 * d_pad % 1024 == 0 and 2 * m0 <= 128
    sv4 = m0 * d_pad // 1024
    return sv4, sv4 + 1


def quantize_int4(vectors: Array) -> tuple[Array, Array]:
    """Per-vector symmetric 4-bit quantization → (codes [N, D] int8 in
    [-7, 7], scales [N] f32). x ≈ codes * scale."""
    amax = jnp.max(jnp.abs(vectors.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    codes = jnp.clip(
        jnp.round(vectors.astype(jnp.float32) / scale[:, None]), -7, 7
    ).astype(jnp.int8)
    return codes, scale.astype(jnp.float32)


def pack_unified4_rows(
    codes: Array,  # [N_pad, D_pad] int8 in [-7,7] (lane-padded)
    scales: Array,  # [N_pad] f32
    nbr_ids: Array,  # [K, m0]
    sent: int,
) -> Array:
    """Pack neighbor blocks into int4 unified rows [K, sv4+1, 128] int32.

    Nibble j (bits 4j..4j+3) of the int32 at (sublane i, lane l) holds the
    two's-complement code of neighbor j*sv4+i, flat position l — chosen so
    the kernel's per-nibble unpack + sublane concat lands in natural
    neighbor-major order with no relayout."""
    k, m0 = nbr_ids.shape
    d_pad = codes.shape[1]
    sv4, _ = unified4_row_sublanes(m0, d_pad)
    rows = jnp.take(codes, nbr_ids.reshape(-1), axis=0)  # [K*m0, d_pad]
    # flat nibble stream (m0*d_pad) → [8 nibble slots, sv4 sublanes, 128]
    g = rows.reshape(k, 8, sv4, 128).astype(jnp.int32) & 0xF
    shifts = (4 * jnp.arange(8, dtype=jnp.int32))[None, :, None, None]
    packed = jnp.sum(g << shifts, axis=1).astype(jnp.int32)  # [K, sv4, 128]
    s_rows = jnp.take(scales, nbr_ids.reshape(-1), axis=0).reshape(k, m0)
    s_bits = jax.lax.bitcast_convert_type(s_rows, jnp.int32)
    ids_row = jnp.full((k, 128), sent, jnp.int32)
    ids_row = jax.lax.dynamic_update_slice(
        ids_row, nbr_ids.astype(jnp.int32), (0, 0)
    )
    ids_row = jax.lax.dynamic_update_slice(ids_row, s_bits, (0, m0))
    return jnp.concatenate([packed, ids_row[:, None, :]], axis=1)


def make_unified4_table_chunked(
    vectors: Array, level0: Array, chunk: int = 1 << 17
) -> tuple[Array, Array, Array]:
    """Build the dense 2D int4 table [N_pad*s4, 128] plus the (codes,
    scales) side tables kept for delta refreshes. Chunked donated
    accumulation bounds peak HBM like the other table builders."""
    import functools as _ft

    n_pad, m0 = level0.shape
    d = vectors.shape[1]
    d_pad = -(-d // 128) * 128
    sv4, s4 = unified4_row_sublanes(m0, d_pad)
    sent = n_pad - 1

    codes, scales = quantize_int4(vectors)
    if d_pad != d:
        codes = jnp.pad(codes, ((0, 0), (0, d_pad - d)))
    codes = jax.block_until_ready(codes)

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def upd(tab, cds, scl, lvl, start):
        rows = pack_unified4_rows(cds, scl, lvl, sent).reshape(-1, 128)
        return jax.lax.dynamic_update_slice(tab, rows, (start * s4, 0))

    tab = jnp.zeros((n_pad * s4, 128), jnp.int32)
    for s in range(0, n_pad, chunk):
        e = min(s + chunk, n_pad)
        tab = upd(tab, codes, scales, level0[s:e], jnp.int32(s))
    return jax.block_until_ready(tab), codes, scales


def upper_level_sizes_u(upper_slot: Array, u_pad: int) -> tuple[int, ...]:
    """Per-level count of REAL slots (< u_pad - 1) in the slot map; one
    device reduce + scalar readback per call. Works on [L, N_pad] and, for
    the sharded stacked layout, [S, L, N_pad] (max over shards). Levels are
    geometrically smaller (~N/M per step), but the stacked `upper` array
    pads every level to level 1's width — without per-level sizing the
    inline descent tables cost ~4.3GB at N=3M, ~90% of it padding rows no
    slot value can ever address."""
    import jax as _jax
    import numpy as np

    if upper_slot.ndim == 3:
        if upper_slot.shape[1] == 0:
            return ()
        mx = jnp.max(
            jnp.where(upper_slot == u_pad - 1, -1, upper_slot), axis=(0, 2)
        )
    else:
        if upper_slot.shape[0] == 0:
            return ()
        mx = jnp.max(
            jnp.where(upper_slot == u_pad - 1, -1, upper_slot), axis=1
        )
    return tuple(int(v) + 1 for v in np.asarray(_jax.device_get(mx)))


def make_upper_tables(
    vectors: Array, upper: Array, upper_slot: Array, level_sizes=None
) -> tuple[tuple[Array, Array], ...]:
    """Per-upper-level unified tables for the inline greedy descent.

    For level l (1-indexed), row `slot` packs that slot's node's M neighbor
    vectors plus the neighbors' *slots at the same level* in the id sublane
    (so the descent loop never touches upper_slot mid-level; the round-1
    design did one serialized XLA row gather per hop, ~9% of query time).
    Returns ((table_l [U_l_pad*s_data, 128], slot_to_id_l [U_l_pad]), ...).

    `level_sizes` (static ints from upper_level_sizes_u): per-level REAL
    slot counts; each level's table is then sized to its own population + a
    dummy row instead of level 1's width (levels shrink ~M-fold each step,
    so uniform padding costs GBs at N=3M). Slot values ≥ the local size
    clamp onto the local dummy row, whose content — all-sentinel links — is
    identical to the global dummy row's by the padding construction."""
    ml, u_pad, m = upper.shape
    n_pad = upper_slot.shape[1]
    sent = n_pad - 1
    m_pad = max(16, -(-m // 16) * 16)
    out = []
    for l in range(ml):
        if level_sizes is None:
            u_l = u_pad
        else:
            u_l = min(u_pad, -(-(level_sizes[l] + 1) // 8) * 8)
        nbrs = upper[l, :u_l]  # [U_l, M] node ids (sent = absent)
        if m_pad != m:
            nbrs = jnp.pad(nbrs, ((0, 0), (0, m_pad - m)), constant_values=sent)
        # neighbor slots at this level; the sentinel id maps to the dummy
        # slot u_pad-1 by construction of upper_slot — clamp to the LOCAL
        # dummy u_l-1
        nbr_slots = jnp.minimum(jnp.take(upper_slot[l], nbrs, axis=0), u_l - 1)
        tab = pack_unified_rows(
            vectors, nbrs, u_l - 1, id_payload=nbr_slots
        ).reshape(-1, 128)
        # slot -> node id (dummy slot stays sentinel); out-of-range slot
        # values clamp onto the dummy row, which is then reset to sentinel
        ids = jnp.full((u_l,), sent, jnp.int32)
        ids = ids.at[jnp.minimum(upper_slot[l], u_l - 1)].set(
            jnp.arange(n_pad, dtype=jnp.int32)
        )
        ids = ids.at[u_l - 1].set(sent)
        out.append((tab, ids))
    return tuple(out)


def make_unified_table(vectors: Array, level0: Array) -> Array:
    """[N_pad*s_data, 128] int32 dense unified node-block table from the
    vector table and the (sentinel-remapped) level-0 adjacency."""
    n_pad = level0.shape[0]
    rows = pack_unified_rows(vectors, level0, n_pad - 1)
    return rows.reshape(-1, 128)


def make_unified_table_chunked(
    vectors: Array, level0: Array, chunk: int = 1 << 17
) -> Array:
    """Build the unified table in row chunks with a donated accumulator so
    peak HBM stays ~table + one chunk (a single-shot build materializes the
    gathered bf16 rows AND the packed output — 2.5x table size, an OOM at
    SIFT1M scale where the table alone is ~12GB on 16GB HBM)."""
    import functools as _ft

    n_pad, m0 = level0.shape
    d = vectors.shape[1]
    d_pad = -(-d // 128) * 128
    _, s_data = unified_row_sublanes(m0, d_pad)
    sent = n_pad - 1

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def upd(tab, x, rows_ids, start):
        rows = pack_unified_rows(x, rows_ids, sent).reshape(-1, 128)
        return jax.lax.dynamic_update_slice(tab, rows, (start * s_data, 0))

    xb = vectors.astype(jnp.bfloat16)  # cast once, not per chunk
    tab = jnp.zeros((n_pad * s_data, 128), jnp.int32)
    # dynamic start: one compiled program for all full chunks (+ the tail)
    for s in range(0, n_pad, chunk):
        e = min(s + chunk, n_pad)
        tab = upd(tab, xb, level0[s:e], jnp.int32(s))
    return jax.block_until_ready(tab)


def _hop_dist_unified_kernel(
    chosen_ref,  # SMEM scalar-prefetch [ceil(B*E/128), 128]
    q_ref,  # VMEM [tb, d_pad]
    tbl_ref,  # ANY/HBM [N_pad*s_data, 128] int32 (dense 2D node blocks)
    out_ref,  # VMEM [tb, e*m0] f32
    ids_ref,  # VMEM [tb, e*m0] int32
    rows,  # VMEM scratch [nbuf, tb*e, s_data, 128] int32 (pipelined)
    sems,  # DMA sems [nbuf]
    *,
    tb,
    e,
    m0,
    sv,
    d_pad,
    ip,
    nbuf,
    int8=False,
    int4=False,
):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    em = e * m0
    s_data = sv + 1

    # NOTE a sentinel-skip variant (conditionally skip the DMA for done
    # queries' sentinel rows + matching per-copy waits) was built and
    # measured 16% SLOWER end-to-end at the headline operating point: the
    # per-copy scalar branches break Mosaic's pipelined descriptor issue,
    # costing more than the skipped descriptors save. Unconditional issue
    # + one whole-buffer byte-count wait is the fast shape.
    def issue(s, buf):
        base = s * tb * e
        for t in range(tb):
            for j in range(e):
                f = base + t * e + j
                c = chosen_ref[f // 128, f % 128]
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(c * s_data, s_data)],
                    rows.at[buf, t * e + j],
                    sems.at[buf],
                ).start()

    # nbuf-deep pipeline: at step 0 prime buffers 0..nbuf-2, then each step
    # issues step+nbuf-1 — keeps (nbuf-1)*tb*e row DMAs in flight to hide
    # HBM random-access latency (2-deep measured ~250GB/s effective on v5e)
    @pl.when(step == 0)
    def _():
        for s0 in range(min(nbuf - 1, nsteps)):
            issue(s0, s0 % nbuf)

    @pl.when(step + nbuf - 1 < nsteps)
    def _():
        issue(step + nbuf - 1, (step + nbuf - 1) % nbuf)

    buf = step % nbuf
    pltpu.make_async_copy(
        tbl_ref.at[pl.ds(0, s_data)], rows.at[buf], sems.at[buf]
    ).wait()
    blk = rows[buf]  # [tb*e, s_data, 128]
    # emit neighbor ids packed [tb, e*m0] (static lane slices — the old
    # [tb, e, 128] raw-tile output cost ~7% of query-loop time in XLA
    # slice+reshape fusions downstream)
    idrow = blk[:, sv, :].reshape(tb, e, 128)
    for j in range(e):
        ids_ref[:, j * m0 : (j + 1) * m0] = idrow[:, j, :m0]
    if int8 or int4:
        if int4:
            # unpack 8 nibbles per int32 with sign-extending shift pairs;
            # the pack order makes the sublane concat land in natural
            # neighbor-major order (pack_unified4_rows)
            v = blk[:, :sv, :]  # [tb*e, sv4, 128] int32
            parts = [(v << (28 - 4 * j)) >> 28 for j in range(8)]
            codes = jnp.concatenate(parts, axis=1)  # [tb*e, 8*sv4, 128]
        else:
            codes = pltpu.bitcast(blk[:, :sv, :], jnp.int8)  # [tb*e,4sv,128]
        r32 = codes.reshape(tb, em, d_pad).astype(jnp.float32)
        # per-neighbor dequant scales ride lanes m0..2m0-1 of the id sublane
        sc_parts = [
            pltpu.bitcast(idrow[:, j, m0 : 2 * m0], jnp.float32)
            for j in range(e)
        ]
        sc = (
            jnp.concatenate(sc_parts, axis=-1) if e > 1 else sc_parts[0]
        )  # [tb, em]
        r32 = r32 * sc[:, :, None]
    else:
        vecs = pltpu.bitcast(blk[:, :sv, :], jnp.bfloat16)  # [tb*e, 2sv, 128]
        r32 = vecs.reshape(tb, em, d_pad).astype(jnp.float32)
    q32 = q_ref[:].astype(jnp.float32)[:, None, :]  # [tb, 1, d_pad]
    if ip:
        out_ref[:] = 1.0 - jnp.sum(r32 * q32, axis=-1)
    else:
        diff = r32 - q32
        out_ref[:] = jnp.sum(diff * diff, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("space", "m0", "tb", "interpret", "nbuf", "int8", "int4"),
)
def hop_dist_unified(
    q: Array,  # [B, D]
    table: Array,  # [N_pad*s_data, 128] int32 dense unified node blocks
    chosen: Array,  # [B, E] int32 node ids to expand (in-range)
    m0: int,
    space: str = "l2",
    tb: int = 16,
    interpret: bool = False,
    nbuf: int = 2,
    int8: bool = False,
    int4: bool = False,
) -> tuple[Array, Array]:
    """Expand `chosen` nodes with ONE contiguous DMA per (query, chosen):
    the unified row carries both the m0 neighbor vectors (bf16-packed) and
    their ids, so the split design's second id-tile DMA and its one-hot
    extraction disappear.

    Returns (dists [B, E*M0] f32, ids [B, E*M0] int32)."""
    b, d = q.shape
    e = chosen.shape[1]
    d_pad = -(-d // 128) * 128
    assert not (int8 and int4)
    if int4:
        sv, s_data = unified4_row_sublanes(m0, d_pad)
    elif int8:
        sv, s_data = unified8_row_sublanes(m0, d_pad)
    else:
        sv, s_data = unified_row_sublanes(m0, d_pad)
    assert table.ndim == 2 and table.shape[0] % s_data == 0, (
        table.shape, s_data,
    )
    if d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, d_pad - d)))
    tb = _normalize_tb(tb, b)
    grid = (b // tb,)
    flat = chosen.reshape(-1)
    p = -(-flat.shape[0] // 128)
    flat = jnp.pad(flat, (0, p * 128 - flat.shape[0]))
    chosen_packed = flat.reshape(p, 128)
    kernel = functools.partial(
        _hop_dist_unified_kernel,
        tb=tb, e=e, m0=m0, sv=sv, d_pad=d_pad, ip=space == "ip", nbuf=nbuf,
        int8=int8, int4=int4,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, d_pad), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(
                    (tb, e * m0), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tb, e * m0), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((nbuf, tb * e, s_data, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, e * m0), jnp.float32),
            jax.ShapeDtypeStruct((b, e * m0), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(chosen_packed, q, table)


def build_inline_tables(
    x, dg, dim, unified_max_bytes, split_max_bytes, upper_inline=True,
    exact_i8=False, keep_delta_tables=True,
):
    """Choose and build the inline fast-path tables for a device graph —
    the ONE place the tier ladder lives (HNSWIndex._full_sync and the query
    service both use it):

      1. bf16 unified node blocks   (fastest; 17 sublanes/row at m0=32,d=128)
      2. int8 unified node blocks   (half the row; the N=2M-per-chip tier)
      3. split bf16 table + id tiles (bulk-build wave workhorse)
      4. None                        (XLA-gather fallback; any shape)

    Returns the tagged tuple for inline_search_kwargs, or None."""
    import jax as _jax

    n_pad, m0_pad = dg.level0.shape
    d_pad = -(-dim // 128) * 128

    def upper_tabs():
        # upper_inline=False skips the per-level unified descent tables —
        # bulk-build waves run at the HBM edge and fall back to the gather
        # descent, serving rebuilds them. Tables are sized per level
        # (upper_level_sizes_u): uniform level-1-width padding cost ~4.3GB
        # at 3M and OOM'd the int4 serving config.
        if not (upper_inline and dg.max_level > 0):
            return ()
        sizes = upper_level_sizes_u(dg.upper_slot, dg.upper.shape[1])
        fn = functools.partial(make_upper_tables, level_sizes=sizes)
        return _jax.jit(fn)(x, dg.upper, dg.upper_slot)

    _, s_row = unified_row_sublanes(m0_pad, d_pad)
    if m0_pad <= 128 and n_pad * s_row * 512 <= unified_max_bytes:
        return ("unified", make_unified_table_chunked(x, dg.level0),
                upper_tabs())
    # int8-tier footprint counts the packed table PLUS the codes/scales side
    # tables make_unified8_table_chunked keeps live for delta refresh
    # (~260MB extra at N=2M/d=128 — right at the tier boundary)
    u8_bytes = (
        n_pad * (m0_pad * d_pad // 512 + 1) * 512 + n_pad * d_pad + 4 * n_pad
        if m0_pad * d_pad % 512 == 0
        else 0
    )
    if (
        2 * m0_pad <= 128
        and m0_pad * d_pad % 512 == 0
        and u8_bytes <= unified_max_bytes
    ):
        table, codes, scales = make_unified8_table_chunked(
            x, dg.level0, exact=exact_i8
        )
        # the quantized side tables stay live for row-delta refresh; a
        # serve-only index drops them (row deltas then force a full resync)
        # — at the HBM edge (N=4M int4) that 0.54GB is the difference
        # between fitting and relay-poisoning the process
        if not keep_delta_tables:
            codes = scales = None
        return ("unified8", table, upper_tabs(), codes, scales)
    # int4 rung: a quarter of the bf16 row (2.5KB/node at m0=32/d=128) —
    # the ~3M-per-chip capacity tier past int8's ~2M. Same footprint
    # accounting: packed table + codes/scales side tables for delta refresh.
    u4_bytes = (
        n_pad * (m0_pad * d_pad // 1024 + 1) * 512 + n_pad * d_pad + 4 * n_pad
        if m0_pad * d_pad % 1024 == 0
        else 0
    )
    if (
        2 * m0_pad <= 128
        and m0_pad * d_pad % 1024 == 0
        and u4_bytes <= unified_max_bytes
    ):
        table, codes, scales = make_unified4_table_chunked(x, dg.level0)
        if not keep_delta_tables:
            codes = scales = None
        return ("unified4", table, upper_tabs(), codes, scales)
    if m0_pad <= 32 and n_pad * m0_pad * d_pad * 2 <= split_max_bytes:
        tab_bytes = n_pad * m0_pad * d_pad * 2
        if tab_bytes > 2**31:
            # single-shot build peaks ~2x table size (gather rows + XLA's
            # layout copy) — an HBM-edge OOM at 1M scale that can poison
            # the relay process; chunk it instead
            t = make_inline_neighbors_chunked(x, dg.level0)
        else:
            t = jax.block_until_ready(make_inline_neighbors(x, dg.level0))
        l0_tiles = jax.block_until_ready(
            _jax.jit(make_level0_tiles)(dg.level0)
        )
        return ("split", t, l0_tiles)
    return None


def make_inline_neighbors(
    vectors: Array, level0: Array, dtype=jnp.bfloat16
) -> Array:
    """Build the [N_pad, M0, D_pad] inline neighbor-vector table from the
    vector table and level-0 adjacency (one-time cost at index upload).
    D is zero-padded to a multiple of 128 (DMA lane alignment); zero lanes
    contribute nothing to either L2 or IP distances.

    The source is cast to the table dtype BEFORE the gather: gathering f32
    first materializes a 2x-table-size temporary (16GB at N=1M — an HBM OOM
    on v5e)."""
    n_pad, m0 = level0.shape
    d = vectors.shape[1]
    d_pad = -(-d // 128) * 128
    rows = jnp.take(vectors.astype(dtype), level0.reshape(-1), axis=0)
    if d_pad != d:
        rows = jnp.pad(rows, ((0, 0), (0, d_pad - d)))
    return rows.reshape(n_pad, m0, d_pad)


def make_inline_neighbors_chunked(
    vectors: Array, level0: Array, dtype=jnp.bfloat16, chunk: int = 1 << 17
) -> Array:
    """make_inline_neighbors with a donated chunk-wise accumulator.

    The single-shot build materializes the gathered rows plus XLA's
    layout/reshape copy — ~2x table size transiently. At N=1M (table
    7.6GiB) that peaks ~15.9GiB: right at the v5e HBM edge, where it
    nondeterministically RESOURCE_EXHAUSTs and (observed on the axon relay)
    poisons every subsequent transfer in the process. Chunking bounds the
    peak at table + one ~1GiB chunk."""
    n_pad, m0 = level0.shape
    d = vectors.shape[1]
    d_pad = -(-d // 128) * 128

    @functools.partial(jax.jit, donate_argnums=(0,))
    def upd(tab, xc, lvl, start):
        rows = jnp.take(xc, lvl.reshape(-1), axis=0)
        if d_pad != d:
            rows = jnp.pad(rows, ((0, 0), (0, d_pad - d)))
        return jax.lax.dynamic_update_slice(
            tab, rows.reshape(lvl.shape[0], m0, d_pad), (start, 0, 0)
        )

    xc = vectors.astype(dtype)  # cast once
    tab = jnp.zeros((n_pad, m0, d_pad), dtype)
    # dynamic start: one compiled program for all full chunks (+ the tail)
    for s in range(0, n_pad, chunk):
        e = min(s + chunk, n_pad)
        tab = upd(tab, xc, level0[s:e], jnp.int32(s))
    return jax.block_until_ready(tab)


@functools.partial(jax.jit, static_argnames=("space", "tb", "interpret"))
def gather_dist_pallas(
    q: Array,  # [B, D]
    table: Array,  # [N, D]
    ids: Array,  # [B, K] int32 (must be in-range)
    space: str = "l2",
    tb: int = 8,
    interpret: bool = False,
) -> Array:
    """[B, K] distances from q[b] to table[ids[b, j]]."""
    b, d = q.shape
    k = ids.shape[1]
    assert b % tb == 0, f"batch {b} must be divisible by tile {tb}"
    if d % 128:
        # Mosaic row DMAs need 128-aligned lane widths (a [1, d] slice of a
        # lane-tiled table is rejected for d % 128 != 0, e.g. Deep-style
        # d=96). Zero lanes change neither L2 nor IP distances, and the
        # [N, d_pad] pad copy is a streaming write (~1ms/GB) — noise next
        # to the gather it feeds.
        d_pad = -(-d // 128) * 128
        q = jnp.pad(q, ((0, 0), (0, d_pad - d)))
        table = jnp.pad(table, ((0, 0), (0, d_pad - d)))
        d = d_pad
    # The ids prefetch lives in scoped SMEM (1MB) and lane-pads each row to
    # a multiple of 128 i32: B=2048, K=40 is exactly 1.00M and overflows
    # once spill slots land. Slice the batch to keep the operand <=512KB.
    k_lanes = -(-k // 128) * 128
    max_b = max(tb, (1 << 19) // (4 * k_lanes) // tb * tb)
    if b > max_b:
        return jnp.concatenate(
            [
                gather_dist_pallas(
                    q[s : s + max_b],
                    table,
                    ids[s : s + max_b],
                    space=space,
                    tb=tb,
                    interpret=interpret,
                )
                for s in range(0, b, max_b)
            ]
        )
    grid = (b // tb,)
    if table.dtype == jnp.bfloat16:
        # Mosaic rejects single sublane-row DMAs from (16,128)-tiled bf16
        # tables (compile-helper crash, deterministic) — copy aligned row
        # pairs instead and pick the wanted member by id parity here.
        q = q.astype(jnp.float32)
        if table.shape[0] % 2:
            table = jnp.pad(table, ((0, 1), (0, 0)))
        table = table.reshape(table.shape[0] // 2, 2, d)
        kernel = functools.partial(
            _gather_dist_kernel_pair, tb=tb, k=k, ip=space == "ip"
        )
        d2 = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (tb, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (tb, 2 * k), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((tb * k, 2, d), table.dtype),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((b, 2 * k), jnp.float32),
            interpret=interpret,
        )(ids >> 1, q, table)
        d2 = d2.reshape(b, k, 2)
        return jnp.where((ids & 1) == 1, d2[:, :, 1], d2[:, :, 0])
    kernel = functools.partial(_gather_dist_kernel, tb=tb, k=k, ip=space == "ip")
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # ids: whole [B, K] array in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (tb, k), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((tb * k, d), table.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
        interpret=interpret,
    )(ids, q, table)
