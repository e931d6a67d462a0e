"""Per-splat projection ("preprocess") and tile binning for the 2DGS
surfel rasterizer.

TPU-first re-design of the reference CUDA preprocess + binning
(`cuda_rasterizer/forward.cu:75-260`, `rasterizer_impl.cu:249-339`):

* projection/AABB/culling is a fully vmapped XLA prologue (differentiable),
* the reference's dynamic per-splat duplication + global 64-bit radix sort
  becomes a *fixed-capacity* duplication (each splat emits a static number of
  tile entries, centered-clamped to its AABB) + ONE int32 key sort
  ``key = tile_id << depth_bits | quantized_depth``, giving per-tile
  depth-sorted ranges via searchsorted. Shapes stay static under jit and the
  host never reads back an entry count (removes the reference's mid-step
  cudaMemcpy sync at `rasterizer_impl.cu:282`).

Math exactly follows the 2DGS formulation (Eq. 5-10 of the paper / the
reference kernels); see file:line citations inline.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.quaternion import quaternion_to_matrix

# constants pinned by the reference (auxiliary.h:20-37, config.h:15-17)
FILTER_SIZE = 0.7071067811865476  # low-pass filter sqrt-variance, Botsch et al.
FILTER_INV_SQUARE = 1.0 / (FILTER_SIZE * FILTER_SIZE)
NEAR_PLANE = 0.2
FAR_PLANE = 100.0
ALPHA_EPS = 1.0 / 255.0
T_EARLY_STOP = 1e-4
ALPHA_CLAMP = 0.99


class SplatProjection(NamedTuple):
    """Per-splat screen-space quantities (all (P, ...) arrays)."""

    tu: jax.Array  # (P, 3) transMat row u
    tv: jax.Array  # (P, 3) transMat row v
    tw: jax.Array  # (P, 3) transMat row w (homogeneous/depth row)
    normal: jax.Array  # (P, 3) camera-space surfel normal (dual-visible flipped)
    center2d: jax.Array  # (P, 2) screen-space AABB center (low-pass filter center)
    extent2d: jax.Array  # (P, 2) AABB half-extent (1 sigma)
    radius: jax.Array  # (P,) pixel radius (3 sigma, >= FilterSize), float
    depth: jax.Array  # (P,) camera-space center depth (sort key)
    valid: jax.Array  # (P,) bool: survived near-cull / degenerate checks


def project_splats(
    means3d: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    viewmat: jax.Array,
    intrins: jax.Array,
    mask: Optional[jax.Array] = None,
    densify_dummy: Optional[jax.Array] = None,
) -> SplatProjection:
    """Project 2D Gaussian surfels to screen space.

    Mirrors `forward.cu` computeTransMat/computeAABB/preprocessCUDA:
    M = [s_x·W·r0 | s_y·W·r1 | p_view] (columns), Tu/Tv/Tw rows of P·M,
    AABB from the homogeneous conic, radius = ceil(3·max(extent, FilterSize)).

    Args:
        means3d: (P, 3) world-space surfel centers.
        quats: (P, 4) rotations, (w, x, y, z), need not be normalized.
        scales: (P, 2) tangent-axis standard deviations (already activated).
        viewmat: (4, 4) world-to-camera SE(3).
        intrins: (4,) pinhole (fx, fy, cx, cy). Unlike the reference kernel
            (which hardcodes cx=W/2, cy=H/2 and needs the KCamera frustum
            workaround, `gs/scene/cameras.py:72-163`), arbitrary principal
            points are supported directly.
        mask: optional (P,) bool; False splats are culled (fixed-capacity
            parameter stores use this for dead slots).
        densify_dummy: optional (P, 2) zeros; added to (Tu_z, Tv_z) so its
            cotangent reproduces the reference's viewspace "mean2D gradient"
            densification signal (`backward.cu:599-649` writes
            dL_dtransMat[2], dL_dtransMat[5] scaled to NDC).
    """
    rot_wc = viewmat[:3, :3]
    t_wc = viewmat[:3, 3]
    p_view = means3d @ rot_wc.T + t_wc  # (P, 3)

    rmat = quaternion_to_matrix(quats)  # (P, 3, 3); columns are tangent axes
    # camera-space tangent frame
    axes_cam = jnp.einsum("ij,pjk->pik", rot_wc, rmat)  # (P, 3, 3)
    a = axes_cam[..., 0] * scales[..., 0:1]  # s_x · W·r0
    b = axes_cam[..., 1] * scales[..., 1:2]  # s_y · W·r1
    tn = axes_cam[..., 2]  # unscaled normal axis

    # dual-visible normal flip: sign(dot(-tn, p_view)) (forward.cu:99-110)
    cos = -jnp.sum(tn * p_view, axis=-1, keepdims=True)
    normal = jnp.where(cos > 0, tn, -tn)

    fx, fy, cx, cy = intrins[0], intrins[1], intrins[2], intrins[3]
    # rows of the projected splat-to-screen homography (forward.cu:112-127)
    stack3 = lambda u, v, w: jnp.stack([u, v, w], axis=-1)
    tw = stack3(a[:, 2], b[:, 2], p_view[:, 2])
    tu = fx * stack3(a[:, 0], b[:, 0], p_view[:, 0]) + cx * tw
    tv = fy * stack3(a[:, 1], b[:, 1], p_view[:, 1]) + cy * tw

    if densify_dummy is not None:
        tu = tu.at[:, 2].add(densify_dummy[:, 0])
        tv = tv.at[:, 2].add(densify_dummy[:, 1])

    # screen AABB of the splat conic (forward.cu:135-163)
    sgn = jnp.array([1.0, 1.0, -1.0], dtype=means3d.dtype)
    d = jnp.sum(sgn * tw * tw, axis=-1, keepdims=True)
    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
    f = sgn / d_safe  # (P, 3)
    cx2d = jnp.sum(f * tu * tw, axis=-1)
    cy2d = jnp.sum(f * tv * tw, axis=-1)

    def safe_sqrt(z):
        # sqrt's VJP at 0 is 0/0=NaN even under a ZERO cotangent, and the
        # NaN poisons every gradient reaching tu/tv/tw (observed: finite
        # losses, gnorm=nan at 50k splats). Double-where keeps the value
        # and zeroes the gradient on the clamped branch.
        pos = z > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, z, 1.0)), 0.0)

    hx = safe_sqrt(cx2d * cx2d - jnp.sum(f * tu * tu, axis=-1))
    hy = safe_sqrt(cy2d * cy2d - jnp.sum(f * tv * tv, axis=-1))
    center2d = jnp.stack([cx2d, cy2d], axis=-1)
    extent2d = jnp.stack([hx, hy], axis=-1)
    radius = jnp.ceil(3.0 * jnp.maximum(jnp.max(extent2d, axis=-1), FILTER_SIZE))

    valid = (p_view[:, 2] > NEAR_PLANE) & (jnp.abs(d[:, 0]) >= 1e-12) & (cos[:, 0] != 0)
    # near-degenerate conics (|d| barely above the cull) produce inf/NaN
    # centers and extents, which select the inf*0=NaN branch inside the
    # compositing gradients even at zero weight — cull them outright
    finite = (
        jnp.isfinite(center2d).all(axis=-1)
        & jnp.isfinite(extent2d).all(axis=-1)
        & (jnp.abs(center2d) < 1e7).all(axis=-1)
        & (extent2d < 1e7).all(axis=-1)
    )
    valid = valid & finite
    if mask is not None:
        valid = valid & mask

    return SplatProjection(
        tu=tu, tv=tv, tw=tw, normal=normal, center2d=center2d,
        extent2d=extent2d, radius=radius, depth=p_view[:, 2], valid=valid,
    )


def quantize_depth(depth: jax.Array, depth_bits: int,
                   near: float = NEAR_PLANE, far: float = FAR_PLANE) -> jax.Array:
    """Monotone int quantization of depth for compound sort keys."""
    t = jnp.clip((depth - near) / (far - near), 0.0, 1.0)
    return (t * ((1 << depth_bits) - 1)).astype(jnp.int32)


class TileBinning(NamedTuple):
    sorted_splat_ids: jax.Array  # (E,) int32, entries sorted by (tile, depth)
    sorted_tile_ids: jax.Array  # (E,) int32 tile of each entry (num_tiles = pad)
    tile_start: jax.Array  # (T,) int32 first entry of each tile
    tile_count: jax.Array  # (T,) int32 entries per tile
    num_entries: jax.Array  # () int32 total valid entries (diagnostic)
    overflowed: jax.Array  # () int32 splats whose tile span was clamped


def tile_grid_shape(height: int, width: int, tile: int) -> Tuple[int, int]:
    return -(-height // tile), -(-width // tile)


class TileRects(NamedTuple):
    min_x: jax.Array  # (P,) int32
    min_y: jax.Array
    span_x: jax.Array  # (P,) int32, <= span_cap
    span_y: jax.Array
    valid: jax.Array  # (P,) bool: projection-valid AND non-empty rect
    overflow: jax.Array  # (P,) bool: rect was clamped to span_cap


def compute_tile_rects(
    proj: SplatProjection, height: int, width: int, tile: int, span_cap: int
) -> TileRects:
    """Per-splat covered-tile rect (`auxiliary.h` getRect), centered-clamped
    to at most span_cap tiles per axis so duplication has a static shape."""
    tiles_y, tiles_x = tile_grid_shape(height, width, tile)
    center = proj.center2d
    radius = proj.radius

    rect_min_x = jnp.clip(jnp.floor((center[:, 0] - radius) / tile), 0, tiles_x).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((center[:, 1] - radius) / tile), 0, tiles_y).astype(jnp.int32)
    rect_max_x = jnp.clip(jnp.floor((center[:, 0] + radius + tile - 1) / tile), 0, tiles_x).astype(jnp.int32)
    rect_max_y = jnp.clip(jnp.floor((center[:, 1] + radius + tile - 1) / tile), 0, tiles_y).astype(jnp.int32)

    span_x = rect_max_x - rect_min_x
    span_y = rect_max_y - rect_min_y
    overflow = (span_x > span_cap) | (span_y > span_cap)

    # centered clamp: keep the span_cap tiles nearest the splat center
    ctile_x = jnp.clip((center[:, 0] / tile).astype(jnp.int32), 0, tiles_x - 1)
    ctile_y = jnp.clip((center[:, 1] / tile).astype(jnp.int32), 0, tiles_y - 1)

    def clamp_span(rmin, rmax, span, ctile):
        lo = jnp.clip(ctile - span_cap // 2, rmin, jnp.maximum(rmax - span_cap, rmin))
        new_min = jnp.where(span > span_cap, lo, rmin)
        return new_min, jnp.minimum(span, span_cap)

    rect_min_x, span_x = clamp_span(rect_min_x, rect_max_x, span_x, ctile_x)
    rect_min_y, span_y = clamp_span(rect_min_y, rect_max_y, span_y, ctile_y)

    empty = (span_x == 0) | (span_y == 0)
    return TileRects(
        min_x=rect_min_x, min_y=rect_min_y, span_x=span_x, span_y=span_y,
        valid=proj.valid & ~empty, overflow=overflow,
    )


def cap_binning(binning: "TileBinning", entry_cap: int,
                chunk: int = 128) -> "TileBinning":
    """Static prefix cap on the sorted entry list (Pallas paths).

    Valid entries sort to the front (sentinels at the end), so truncating
    to `entry_cap` is EXACT whenever num_entries <= cap; past it the global
    tail (highest tile ids) drops — observable via num_entries vs cap.
    Works on single or batched (leading-dim) binnings."""
    if not entry_cap:
        return binning
    cap = -(-entry_cap // chunk) * chunk
    e = binning.sorted_splat_ids.shape[-1]
    if cap >= e:
        return binning
    start = jnp.minimum(binning.tile_start, cap)
    count = jnp.minimum(binning.tile_start + binning.tile_count, cap) - start
    return binning._replace(
        sorted_splat_ids=binning.sorted_splat_ids[..., :cap],
        sorted_tile_ids=binning.sorted_tile_ids[..., :cap],
        tile_start=start,
        tile_count=count,
    )


def align_binning(binning: "TileBinning", chunk: int = 128) -> "TileBinning":
    """Re-layout the sorted entry list so every tile's segment starts on a
    CHUNK boundary (pad slots between segments; static output size
    E + T*chunk).

    With aligned segments no chunk is ever shared by two tiles, so the
    Pallas backward's per-entry gradient slab becomes WRITE-ONLY — the
    read-modify-write chunk DMAs (and their serialization waits) that the
    boundary-sharing layout required are dropped entirely (the TPU
    replacement for `backward.cu`'s atomicAdd contention). Pad slots carry
    splat id 0 and sit outside [start, start+count), so the kernels mask
    them exactly like sentinel tails. Works on single or batched
    (leading-dim) binnings.

    Implementation is a sort-merge built only from vector ops, scans and one
    int32 key sort — no gather, no scatter, no searchsorted. (The obvious
    per-output searchsorted+gather lowered to ~90 ms/frame on TPU; a
    scatter-based destination computation is miscompiled by the SPMD
    partitioner when the result feeds a shard_map — see
    tests/test_pallas_kernel.py mesh parity.) Each real entry's aligned
    destination follows from two prefix sums over the entry stream:

      off[i]  = position of entry i within its tile segment
                (segmented +1 scan, reset at tile boundaries)
      S[i]    = chunk * number of chunk-openings up to i, where entry i
                opens a chunk iff off[i] % chunk == 0; a finished segment
                of count c therefore consumed exactly ceil(c/chunk)*chunk
                aligned slots, so S[i] - chunk*(off[i]//chunk + 1) ==
                astart[tile(i)]  and  dst[i] = S[i] - chunk + off[i]%chunk.

    Explicit pad entries fill each tile's alignment gap; one sort by dst
    places everything (sorts are the fast primitive here: ~12 ms at 3.2M
    entries, see bin_splats_batch)."""
    def one(ids, tiles, start, count):
        e_in = ids.shape[0]
        t = start.shape[0]
        e_out = e_in + t * chunk
        padded = (-(-count // chunk) * chunk).astype(jnp.int32)
        gap = padded - count  # in [0, chunk)
        astart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(padded).astype(jnp.int32)]
        )[:-1]
        i = jnp.arange(e_in, dtype=jnp.int32)
        total = start[-1] + count[-1]  # sentinel/dropped tail starts here
        # segmented scan: off[i]+1 = entries since this tile's first entry
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), tiles[1:] != tiles[:-1]]
        )
        def seg_combine(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, av + bv), af | bf
        seg, _ = jax.lax.associative_scan(
            seg_combine, (jnp.ones((e_in,), jnp.int32), boundary)
        )
        off = seg - 1
        opens = jnp.where(off % chunk == 0, jnp.int32(chunk), jnp.int32(0))
        s = jax.lax.associative_scan(jnp.add, opens)
        dst_real = jnp.where(i < total, s - chunk + off % chunk, e_out + i)
        ids_real = jnp.where(i < total, ids, 0)
        # pad entries: gap[t] of them land in tile t's alignment gap, the
        # rest get unique keys past every used slot (ids are 0 either way).
        jj = jnp.arange(chunk, dtype=jnp.int32)
        pad_used = jj[None, :] < gap[:, None]
        pad_dst = jnp.where(
            pad_used,
            astart[:, None] + count[:, None] + jj[None, :],
            2 * e_out + jnp.arange(t * chunk, dtype=jnp.int32).reshape(t, chunk),
        ).reshape(-1)
        num_tiles = jnp.int32(t)
        pad_tile = jnp.where(
            pad_used,
            jnp.arange(t, dtype=jnp.int32)[:, None],
            num_tiles,
        ).reshape(-1)
        tiles_real = jnp.where(i < total, tiles, num_tiles)
        all_dst = jnp.concatenate([dst_real, pad_dst])
        all_ids = jnp.concatenate([ids_real, jnp.zeros((t * chunk,), ids.dtype)])
        all_tiles = jnp.concatenate([tiles_real, pad_tile])
        _, new_ids, new_tiles = jax.lax.sort(
            [all_dst, all_ids, all_tiles], num_keys=1
        )
        return new_ids, new_tiles, astart
    if binning.sorted_splat_ids.ndim == 2:
        # unrolled like bin_splats_batch: a batched lax.sort lowers ~3x
        # slower on TPU than M independent sorts
        m = binning.sorted_splat_ids.shape[0]
        outs = [
            one(binning.sorted_splat_ids[f], binning.sorted_tile_ids[f],
                binning.tile_start[f], binning.tile_count[f])
            for f in range(m)
        ]
        new_ids = jnp.stack([o[0] for o in outs])
        new_tiles = jnp.stack([o[1] for o in outs])
        astart = jnp.stack([o[2] for o in outs])
    else:
        new_ids, new_tiles, astart = one(
            binning.sorted_splat_ids, binning.sorted_tile_ids,
            binning.tile_start, binning.tile_count
        )
    return binning._replace(sorted_splat_ids=new_ids,
                            sorted_tile_ids=new_tiles, tile_start=astart)


def bin_splats_batch(
    proj_b: SplatProjection,
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
) -> TileBinning:
    """bin_splats over a leading frame dim, unrolled as M independent sorts.

    NOT a jax.vmap: XLA lowers a batched variadic `lax.sort` on TPU ~3x
    slower than M independent sorts (measured at M=2, P=200k, span_cap=4:
    77.6 ms vmapped vs 24.4 ms unrolled — the batched sort comparator
    defeats the fast int-sort path). M is small and static, so a python
    unroll compiles to M parallel-schedulable sorts.
    """
    m = proj_b.depth.shape[0]
    outs = [
        bin_splats(jax.tree.map(lambda x: x[f], proj_b), height, width,
                   tile=tile, span_cap=span_cap)
        for f in range(m)
    ]
    return jax.tree.map(lambda *x: jnp.stack(x), *outs)


def _tile_hist_matmul(
    min_x, min_y, span_x, span_y, emit_mask, tiles_y: int, tiles_x: int
):
    """Per-tile emitted-entry counts WITHOUT sorting, via the integral-image
    corner trick on the MXU.

    Each emitter contributes +1 to every tile of its [min, min+span) rect;
    summing signed corner impulses and 2D-prefix-summing recovers the per-
    tile histogram:  H = A^T B  with  A = onehot(min_y) - onehot(min_y+span_y)
    (rows masked by emit_mask) and  B = onehot(min_x) - onehot(min_x+span_x).
    One (ty+1, K) x (K, tx+1) f32 matmul over K emitters — products are
    exactly ±1/0 and counts stay far below 2^24, so f32 accumulation is
    exact. This replaces the count-by-sorting the reference gets for free
    from its radix sort (`rasterizer_impl.cu:249-339`) at P-cost instead of
    E-cost, and lets the aligned layout be computed BEFORE the one key sort
    (see bin_splats_aligned)."""
    m = emit_mask.astype(jnp.float32)
    ty1 = jnp.arange(tiles_y + 1, dtype=jnp.int32)
    tx1 = jnp.arange(tiles_x + 1, dtype=jnp.int32)
    a = (
        (min_y[:, None] == ty1[None, :]).astype(jnp.float32)
        - ((min_y + span_y)[:, None] == ty1[None, :]).astype(jnp.float32)
    ) * m[:, None]
    b = (
        (min_x[:, None] == tx1[None, :]).astype(jnp.float32)
        - ((min_x + span_x)[:, None] == tx1[None, :]).astype(jnp.float32)
    )
    h = jax.lax.dot(
        a.T, b, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    hist2d = jnp.cumsum(jnp.cumsum(h, axis=0), axis=1)[:tiles_y, :tiles_x]
    return jnp.rint(hist2d).astype(jnp.int32).reshape(-1)


def bin_splats_aligned(
    proj: SplatProjection,
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
    chunk: int = 128,
    entry_cap: int = 0,
) -> TileBinning:
    """Fused bin_splats + cap_binning + align_binning in ONE key sort.

    The separate pipeline sorts twice (the (tile|depth) key sort, then
    align_binning's destination sort) plus two associative scans and a
    searchsorted — all E-sized. Here the per-tile counts are known BEFORE
    sorting (`_tile_hist_matmul`), so the chunk-alignment pad entries are
    emitted alongside the real entries with keys that place them at each
    tile segment's end, and a single stable sort produces the final aligned
    layout directly; tile_start/tile_count come from the histogram cumsum,
    no searchsorted. Layout contract is align_binning's: every segment
    starts on a `chunk` boundary, pad slots carry splat id 0 outside
    [start, start+count).

    Two differences vs the separate pipeline, both benign:
    * real depths quantize to at most 2^depth_bits - 2 (pads own the top
      code), so entries at the far plane may swap order among themselves;
    * with entry_cap, the cap applies to the ALIGNED stream at
      round(entry_cap) + T*chunk — every real entry the separate pipeline
      kept is kept (pad slots never evict a real entry), and the output
      size equals the separate pipeline's exactly.
    """
    tiles_y, tiles_x = tile_grid_shape(height, width, tile)
    num_tiles = tiles_x * tiles_y
    tile_bits = max(1, math.ceil(math.log2(max(num_tiles, 2))))
    depth_bits = 30 - tile_bits
    if depth_bits < 12:
        raise ValueError(
            f"too many tiles ({num_tiles}) for int32 keys; increase tile size"
        )

    p = proj.center2d.shape[0]
    rects = compute_tile_rects(proj, height, width, tile, span_cap)
    depth_max = (1 << depth_bits) - 2
    depth_q = jnp.minimum(
        quantize_depth(proj.depth, depth_bits), depth_max
    )
    sentinel = jnp.int32((num_tiles << depth_bits))

    def emit(rect_min_x, rect_min_y, span_x, span_y, valid, depth_qv, cap):
        j = jnp.arange(cap * cap, dtype=jnp.int32)
        dx = j[None, :] % jnp.maximum(span_x, 1)[:, None]
        dy = j[None, :] // jnp.maximum(span_x, 1)[:, None]
        in_rect = (dy < span_y[:, None]) & valid[:, None]
        tile_id = (rect_min_y[:, None] + dy) * tiles_x + (
            rect_min_x[:, None] + dx)
        keys = (tile_id << depth_bits) | depth_qv[:, None]
        return jnp.where(in_rect, keys, sentinel).reshape(-1)

    small = 2
    if span_cap <= small:
        keys = emit(rects.min_x, rects.min_y, rects.span_x, rects.span_y,
                    rects.valid, depth_q, span_cap)
        splat_ids = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.int32)[:, None],
            (p, span_cap * span_cap)).reshape(-1)
        overflowed = jnp.sum((rects.overflow & rects.valid).astype(jnp.int32))
        hist = _tile_hist_matmul(
            rects.min_x, rects.min_y, rects.span_x, rects.span_y,
            rects.valid, tiles_y, tiles_x,
        )
    else:
        # identical two-pool partition to bin_splats (see its docstring)
        rects2 = compute_tile_rects(proj, height, width, tile, small)
        is_big = rects.valid & (
            (rects.span_x > small) | (rects.span_y > small))
        big_cap = min(p, max(32, p // 16))
        rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
        in_pool = is_big & (rank < big_cap)
        pool_key = jnp.where(in_pool, rank, jnp.int32(p))
        _, big_ids = jax.lax.sort(
            [pool_key, jnp.arange(p, dtype=jnp.int32)], num_keys=1)
        big_ids = big_ids[:big_cap]
        n_big = jnp.sum(is_big.astype(jnp.int32))
        slot_valid = jnp.arange(big_cap, dtype=jnp.int32) < jnp.minimum(
            n_big, big_cap)

        keys_small = emit(
            rects2.min_x, rects2.min_y, rects2.span_x, rects2.span_y,
            rects2.valid & ~in_pool, depth_q, small)
        keys_big = emit(
            rects.min_x[big_ids], rects.min_y[big_ids],
            rects.span_x[big_ids], rects.span_y[big_ids],
            slot_valid, depth_q[big_ids], span_cap)
        keys = jnp.concatenate([keys_small, keys_big])
        ids_small = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.int32)[:, None],
            (p, small * small)).reshape(-1)
        ids_big = jnp.broadcast_to(
            big_ids[:, None], (big_cap, span_cap * span_cap)).reshape(-1)
        splat_ids = jnp.concatenate([ids_small, ids_big])
        overflowed = (
            jnp.sum((rects.overflow & rects.valid).astype(jnp.int32))
            + jnp.maximum(n_big - big_cap, 0)
        )
        # one K = P + big_cap histogram matmul covering both pools
        hist = _tile_hist_matmul(
            jnp.concatenate([rects2.min_x, rects.min_x[big_ids]]),
            jnp.concatenate([rects2.min_y, rects.min_y[big_ids]]),
            jnp.concatenate([rects2.span_x, rects.span_x[big_ids]]),
            jnp.concatenate([rects2.span_y, rects.span_y[big_ids]]),
            jnp.concatenate([rects2.valid & ~in_pool, slot_valid]),
            tiles_y, tiles_x,
        )

    padded = -(-hist // chunk) * chunk
    gap = padded - hist  # pads used per tile, in [0, chunk)
    astart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )[:-1]

    # pad entries: key (t<<db | db_max+1) lands after every real entry of
    # tile t (real depths clip to db_max); unused pads get sentinel keys
    jj = jnp.arange(chunk, dtype=jnp.int32)
    pad_used = jj[None, :] < gap[:, None]
    pad_keys = jnp.where(
        pad_used,
        (jnp.arange(num_tiles, dtype=jnp.int32)[:, None] << depth_bits)
        | (depth_max + 1),
        sentinel,
    ).reshape(-1)
    all_keys = jnp.concatenate([keys, pad_keys])
    all_ids = jnp.concatenate(
        [splat_ids, jnp.zeros((num_tiles * chunk,), jnp.int32)]
    )
    # sentinel emissions (outside their splat's rect) must land as id-0
    # pads, matching align_binning's zeroed tail
    all_ids = jnp.where(all_keys == sentinel, 0, all_ids)
    keys_sorted, ids_sorted = jax.lax.sort([all_keys, all_ids], num_keys=1)
    tile_of_entry = jnp.minimum(keys_sorted >> depth_bits, num_tiles)

    binning = TileBinning(
        sorted_splat_ids=ids_sorted,
        sorted_tile_ids=tile_of_entry.astype(jnp.int32),
        tile_start=astart,
        tile_count=hist,
        num_entries=jnp.sum(hist),
        overflowed=overflowed,
    )
    if entry_cap:
        cap = -(-entry_cap // chunk) * chunk + num_tiles * chunk
        e = binning.sorted_splat_ids.shape[-1]
        if cap < e:
            start = jnp.minimum(binning.tile_start, cap)
            count = jnp.minimum(
                binning.tile_start + binning.tile_count, cap) - start
            binning = binning._replace(
                sorted_splat_ids=binning.sorted_splat_ids[..., :cap],
                sorted_tile_ids=binning.sorted_tile_ids[..., :cap],
                tile_start=start,
                tile_count=count,
            )
    return binning


def bin_splats_aligned_batch(
    proj_b: SplatProjection,
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
    chunk: int = 128,
    entry_cap: int = 0,
) -> TileBinning:
    """bin_splats_aligned over a leading frame dim, python-unrolled for the
    same reason as bin_splats_batch (batched lax.sort is ~3x slower)."""
    m = proj_b.depth.shape[0]
    outs = [
        bin_splats_aligned(
            jax.tree.map(lambda x: x[f], proj_b), height, width,
            tile=tile, span_cap=span_cap, chunk=chunk, entry_cap=entry_cap)
        for f in range(m)
    ]
    return jax.tree.map(lambda *x: jnp.stack(x), *outs)


def bin_splats(
    proj: SplatProjection,
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
) -> TileBinning:
    """Fixed-capacity tile binning + one int32 key sort.

    Entries cover (a centered clamp of) each splat's AABB tile rect
    (`auxiliary.h` getRect semantics). Entries outside the rect get sentinel
    keys that sort to the end. Depth order within a tile comes from packing
    quantized depth into the low key bits.

    TWO-POOL emission (round-5 perf): the sort is the binning's whole cost
    and scales with the emission count, but converged scenes average < 2
    covered tiles per splat — a flat ``span_cap**2`` duplication sorts
    P*16 keys of which ~88% are sentinels (measured 21.8 ms of a 135 ms
    step at 200k/256^2/2 frames). Splats whose rect fits 2x2 (the vast
    majority) emit 4 entries; the rare larger splats go through a
    fixed-capacity BIG pool (``p//16`` slots) that emits the full
    ``span_cap**2``. Coverage is EXACT while the pool suffices; excess big
    splats degrade to their centered 2x2 clamp and are counted in
    ``overflowed`` (same contract as the span_cap clamp itself). Total
    emission drops 16P -> 4P + P = 5P, the sort ~3x faster.
    """
    tiles_y, tiles_x = tile_grid_shape(height, width, tile)
    num_tiles = tiles_x * tiles_y
    tile_bits = max(1, math.ceil(math.log2(max(num_tiles, 2))))
    depth_bits = 30 - tile_bits
    if depth_bits < 12:
        raise ValueError(
            f"too many tiles ({num_tiles}) for int32 keys; increase tile size"
        )

    p = proj.center2d.shape[0]
    rects = compute_tile_rects(proj, height, width, tile, span_cap)
    depth_q = quantize_depth(proj.depth, depth_bits)
    sentinel = jnp.int32((num_tiles << depth_bits))

    def emit(rect_min_x, rect_min_y, span_x, span_y, valid, depth_qv, cap):
        """(N, cap**2) duplication -> flat (keys, in_rect-masked)."""
        j = jnp.arange(cap * cap, dtype=jnp.int32)
        dx = j[None, :] % jnp.maximum(span_x, 1)[:, None]
        dy = j[None, :] // jnp.maximum(span_x, 1)[:, None]
        in_rect = (dy < span_y[:, None]) & valid[:, None]
        tile_id = (rect_min_y[:, None] + dy) * tiles_x + (
            rect_min_x[:, None] + dx)
        keys = (tile_id << depth_bits) | depth_qv[:, None]
        return jnp.where(in_rect, keys, sentinel).reshape(-1)

    small = 2
    if span_cap <= small:
        keys = emit(rects.min_x, rects.min_y, rects.span_x, rects.span_y,
                    rects.valid, depth_q, span_cap)
        splat_ids = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.int32)[:, None],
            (p, span_cap * span_cap)).reshape(-1)
        overflowed = jnp.sum((rects.overflow & rects.valid).astype(jnp.int32))
    else:
        # SMALL pool: every splat's centered 2x2 clamp (exact for span<=2)
        rects2 = compute_tile_rects(proj, height, width, tile, small)
        is_big = rects.valid & (
            (rects.span_x > small) | (rects.span_y > small))
        big_cap = min(p, max(32, p // 16))
        rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
        in_pool = is_big & (rank < big_cap)
        # pool slots -> splat ids, in rank order (stable int sort)
        pool_key = jnp.where(in_pool, rank, jnp.int32(p))
        _, big_ids = jax.lax.sort(
            [pool_key, jnp.arange(p, dtype=jnp.int32)], num_keys=1)
        big_ids = big_ids[:big_cap]
        n_big = jnp.sum(is_big.astype(jnp.int32))
        slot_valid = jnp.arange(big_cap, dtype=jnp.int32) < jnp.minimum(
            n_big, big_cap)

        keys_small = emit(
            rects2.min_x, rects2.min_y, rects2.span_x, rects2.span_y,
            rects2.valid & ~in_pool, depth_q, small)
        keys_big = emit(
            rects.min_x[big_ids], rects.min_y[big_ids],
            rects.span_x[big_ids], rects.span_y[big_ids],
            slot_valid, depth_q[big_ids], span_cap)
        keys = jnp.concatenate([keys_small, keys_big])
        ids_small = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.int32)[:, None],
            (p, small * small)).reshape(-1)
        ids_big = jnp.broadcast_to(
            big_ids[:, None], (big_cap, span_cap * span_cap)).reshape(-1)
        splat_ids = jnp.concatenate([ids_small, ids_big])
        # coverage-loss telemetry: span_cap-clamped splats + pool overflow
        overflowed = (
            jnp.sum((rects.overflow & rects.valid).astype(jnp.int32))
            + jnp.maximum(n_big - big_cap, 0)
        )

    keys_sorted, ids_sorted = jax.lax.sort([keys, splat_ids], num_keys=1)

    tile_of_entry = keys_sorted >> depth_bits
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits
    starts = jnp.searchsorted(keys_sorted, boundaries, side="left").astype(jnp.int32)
    tile_start = starts[:-1]
    tile_count = starts[1:] - starts[:-1]

    return TileBinning(
        sorted_splat_ids=ids_sorted,
        sorted_tile_ids=tile_of_entry.astype(jnp.int32),
        tile_start=tile_start,
        tile_count=tile_count,
        num_entries=jnp.sum(tile_count),
        overflowed=overflowed,
    )
