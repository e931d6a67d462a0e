"""Pallas backward kernel for the tiled surfel rasterizer.

Implements the analytic backward of per-tile alpha compositing for every
cotangent used in training: color, expected depth, alpha, normal, and
distortion (whose pairwise form needs only the forward's total S1/S2/A
accumulators — see the kernel comment). Median depth/weight are the only
outputs without gradients; they are never supervised (depth_ratio=0,
gs/arguments/__init__.py:68). Semantics mirror
`backward.cu:144-449`: a back-to-front traversal reconstructing the
transmittance chain by division, with suffix accumulators replacing atomics.

Design:
* residuals from the forward: final transmittance T_fin and the per-pixel
  contributor count n_contrib (like the reference's final_T / n_contrib
  buffers);
* one program per tile, chunks walked in REVERSE; within a chunk the
  T-chain and the suffix sums are resolved with Hillis-Steele prefix ops
  over the lane (entry) axis — no sequential splat loop;
* per-entry gradients (d slab-coefficients — the affine intersection form,
  see pallas_kernel's slab layout — plus d opacity, d rgb, d normal)
  are written into a transposed (32, E) grad slab with WRITE-ONLY chunk
  DMAs: `common.align_binning` pads every tile's entry segment to a CHUNK
  boundary, so no chunk is shared by two tiles and no read-modify-write
  (or cross-program ordering) is needed;
* an XLA epilogue reduces entry gradients to splat gradients (inverse
  permutation + segment reshape — the atomics-free equivalent of
  `backward.cu`'s atomicAdd into dL_d*).

`rasterize_pallas_grad` wires forward+backward into a jax.custom_vjp whose
outputs/gradients are pinned to the autodiff XLA path in tests.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidu4d_tpu.ops.rasterize import common
from vidu4d_tpu.ops.rasterize.pallas_kernel import (
    CHUNK,
    _F,
    _E0,
    _E1,
    _E2,
    _EXTRA,
    _NRM,
    _OPAC,
    _PA,
    _PB,
    _PC,
    _QD,
    _RGB,
    _TW2,
    _prefix_add_lanes,
    _prefix_mul_lanes,
)


# fused one-sort binning+alignment (common.bin_splats_aligned) is the
# default production path; VIDU4D_FUSED_BINNING=0 restores the separate
# bin -> cap -> align pipeline for A/B timing and bisecting
_FUSED_BINNING = os.environ.get("VIDU4D_FUSED_BINNING", "1") != "0"


def _suffix_mul_lanes(x):
    """Inclusive suffix product along lanes (Hillis-Steele, rolls only —
    Mosaic has no `rev`)."""
    k = x.shape[1]
    steps = int(math.log2(k))
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s in range(steps):
        shift = 1 << s
        shifted = pltpu.roll(x, (k - shift) % k, axis=1)  # x[i + shift]
        x = x * jnp.where(col < k - shift, shifted, 1.0)
    return x


def _suffix_add_lanes(x):
    k = x.shape[1]
    steps = int(math.log2(k))
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s in range(steps):
        shift = 1 << s
        shifted = pltpu.roll(x, (k - shift) % k, axis=1)
        x = x + jnp.where(col < k - shift, shifted, 0.0)
    return x


def _make_bwd_kernel(tiles_x: int, tile: int, n_entries: int,
                     n_extra: int = 0, n_tiles_per_frame: int = 0):
    px_n = tile * tile
    # used grad rows are [0, 18 + n_extra); HBM slices must be aligned to
    # the (8, 128) tiling, so round up to a sublane multiple
    ng = -(-(_EXTRA + n_extra) // 8) * 8
    n_chunks_total = n_entries // CHUNK

    def kernel(tile_ids_ref, start_ref, count_ref, props_hbm, cot_ref,
               resid_ref, grads_in_hbm, grads_hbm, scratch, gscratch, sem,
               gsem_w):
        del grads_in_hbm  # aliased with grads_hbm (zero-init for untouched chunks)
        t = pl.program_id(0)
        start = start_ref[t]
        count = count_ref[t]
        tg = tile_ids_ref[t]
        tl = tg % n_tiles_per_frame if n_tiles_per_frame else tg
        base_x = (tl % tiles_x) * tile
        base_y = (tl // tiles_x) * tile

        lin = jax.lax.broadcasted_iota(jnp.int32, (px_n, 1), 0)
        pxf = (base_x + lin % tile).astype(jnp.float32) + 0.5
        pyf = (base_y + lin // tile).astype(jnp.float32) + 0.5
        # pixel-only quadratic term of rho2d (per tile, not per chunk)
        pq = common.FILTER_INV_SQUARE * (pxf * pxf + pyf * pyf)

        # suffix-sum-as-matmul operand: suf_incl = x @ tri_ge rides the MXU
        # (one (px_n, CHUNK) x (CHUNK, CHUNK) contraction) instead of a
        # log2(CHUNK)-step Hillis-Steele roll chain on the VPU
        tri_ge = (
            jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
        ).astype(jnp.float32)

        # cotangents + residuals for this tile's pixels: (1, px_n, c)
        g_c = [cot_ref[0, :, i][:, None] for i in range(3)]  # color
        g_d = cot_ref[0, :, 3][:, None]
        g_a = cot_ref[0, :, 4][:, None]  # alpha output
        g_n = [cot_ref[0, :, 5 + i][:, None] for i in range(3)]
        g_bgdot = cot_ref[0, :, 8][:, None]  # sum_c gC_c * bg_c (incl. extras)
        g_dist = cot_ref[0, :, 9][:, None]  # distortion cotangent
        g_extra = [cot_ref[0, :, 10 + e][:, None] for e in range(n_extra)]
        t_fin = resid_ref[0, :, 0][:, None]
        n_contrib = resid_ref[0, :, 1][:, None]  # float count
        s1_tot = resid_ref[0, :, 2][:, None]  # sum w·m over the pixel
        s2_tot = resid_ref[0, :, 3][:, None]  # sum w·m²
        # distortion is pairwise: D = sum_{i>j} w_i w_j (m_i - m_j)^2
        # (the streaming form of forward.cu:410-436 telescopes to this), so
        # dD/dw_k = m_k² A + S2 - 2 m_k S1 and dD/dm_k = 2 w_k (m_k A - S1)
        # with the TOTAL accumulators A = 1 - T_fin, S1, S2 — no suffix
        # scan needed (self-terms vanish).
        a_tot = 1.0 - t_fin

        # d L / d T_fin: alpha output = 1 - T_fin, color += T_fin * bg
        g_tfin = -g_a + g_bgdot

        first_chunk = start // CHUNK
        base0 = first_chunk * CHUNK
        # entries past the tile-wide max contributor rank have exactly zero
        # gradient (ok requires rank < n_contrib) — skip their chunks and
        # RMW DMAs entirely (the backward mirror of forward.cu:401-406).
        count_eff = jnp.minimum(
            count, jnp.ceil(jnp.max(n_contrib)).astype(jnp.int32)
        )
        num_chunks = jnp.where(
            count_eff > 0, pl.cdiv(start + count_eff - base0, CHUNK), 0
        )

        # chunk-major slabs (N, rows, CHUNK): each DMA moves one whole
        # leading-index block (see pack_props on why not flat (rows, E))
        def chunk_idx(ci):
            c = num_chunks - 1 - ci  # reverse order
            return jnp.minimum(first_chunk + c, n_chunks_total - 1)

        def chunk_base(ci):
            return chunk_idx(ci) * CHUNK

        def props_copy(ci, slot):
            return pltpu.make_async_copy(
                props_hbm.at[chunk_idx(ci)],
                scratch.at[slot], sem.at[slot],
            )

        # aligned tile segments (common.align_binning) mean no chunk is
        # shared by two tiles, so the grads slab is WRITE-ONLY: no RMW
        # read DMA, no read/write ordering hazard across grid steps. The
        # double-buffered write of chunk ci rides under chunk ci+1's
        # compute; slot reuse waits on the write issued two chunks ago.
        def gwrite(ci, slot):
            return pltpu.make_async_copy(
                gscratch.at[slot],
                grads_hbm.at[chunk_idx(ci), :ng],
                gsem_w.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            props_copy(0, 0).start()

        def body(ci, carry):
            t_after, s_gw = carry  # (px_n, 1) each
            slot = jax.lax.rem(ci, 2)
            # prefetch the next (earlier) chunk under this chunk's compute
            @pl.when(ci + 1 < num_chunks)
            def _():
                props_copy(ci + 1, 1 - slot).start()

            props_copy(ci, slot).wait()
            base = chunk_base(ci)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            entry_id = base + lane
            valid_k = (entry_id >= start) & (entry_id < start + count)
            # rank within the tile (0-based); included iff rank < n_contrib
            rank = (entry_id - start).astype(jnp.float32)

            row = lambda i: scratch[slot, i, :][None, :]
            # recompute the forward response (same affine-coefficient math
            # as the fwd kernel: p = A + px*B + py*C, depth3d = q / pz)
            px_ = row(_PA) + pxf * row(_PB) + pyf * row(_PC)
            py_ = row(_PA + 1) + pxf * row(_PB + 1) + pyf * row(_PC + 1)
            pz_ = row(_PA + 2) + pxf * row(_PB + 2) + pyf * row(_PC + 2)
            pz_ok = pz_ != 0.0
            pz_safe = jnp.where(pz_ok, pz_, 1.0)
            ipz = 1.0 / pz_safe
            rho3d = (px_ * px_ + py_ * py_) * (ipz * ipz)
            rho2d = pq + row(_E0) + pxf * row(_E1) + pyf * row(_E2)
            use3d = rho3d <= rho2d
            rho = jnp.minimum(rho3d, rho2d)
            depth = jnp.where(
                use3d,
                row(_QD) * ipz,
                jnp.broadcast_to(row(_TW2), rho3d.shape),
            )
            alpha_raw = row(_OPAC) * jnp.exp(-0.5 * rho)
            clamped = alpha_raw > common.ALPHA_CLAMP
            alpha = jnp.minimum(common.ALPHA_CLAMP, alpha_raw)
            ok = (
                pz_ok & (depth >= common.NEAR_PLANE)
                & (alpha >= common.ALPHA_EPS) & valid_k
                & (rank < n_contrib)
            )
            alpha = jnp.where(ok, alpha, 0.0)
            # sanitize quantities whose inf/NaN values would leak through
            # 0-weight products (mirrors the forward's depth gating)
            depth = jnp.where(ok, depth, 0.0)

            om = 1.0 - alpha
            # T before entry i = t_after / prod_{j >= i in chunk}(1 - a_j)
            # ... computed as suffix product then division-free recurrence:
            sp_incl = _suffix_mul_lanes(om)  # prod_{j>=i}
            t_before = t_after / sp_incl  # (px_n, CHUNK); om>=0.01 when ok
            w = alpha * t_before

            # NDC-mapped depth for the distortion loss (forward.cu:410-416)
            depth_pos = jnp.maximum(depth, 1e-6)
            m = (common.FAR_PLANE * depth_pos
                 - common.FAR_PLANE * common.NEAR_PLANE) / (
                (common.FAR_PLANE - common.NEAR_PLANE) * depth_pos)

            # Gw: cotangent wrt w_i (color/depth/normal/distortion terms)
            gw = (
                row(_RGB) * g_c[0] + row(_RGB + 1) * g_c[1]
                + row(_RGB + 2) * g_c[2]
                + depth * g_d
                + row(_NRM) * g_n[0] + row(_NRM + 1) * g_n[1]
                + row(_NRM + 2) * g_n[2]
                + g_dist * (m * m * a_tot + s2_tot - 2.0 * m * s1_tot)
            )
            for e in range(n_extra):
                gw = gw + row(_EXTRA + e) * g_extra[e]

            # suffix over j > i of Gw_j w_j (within chunk + carry)
            gww = gw * w
            suf_gww = jax.lax.dot(
                gww, tri_ge, preferred_element_type=jnp.float32
            ) - gww + s_gw
            om_safe = jnp.maximum(om, 1e-3)
            g_alpha = gw * t_before - (suf_gww + g_tfin * t_fin) / om_safe
            g_alpha = jnp.where(ok & ~clamped, g_alpha, 0.0)

            # chain alpha -> (opacity, rho)
            exp_term = jnp.exp(-0.5 * rho)
            g_opac = g_alpha * exp_term
            g_rho = g_alpha * row(_OPAC) * exp_term * (-0.5)

            # depth cotangent per entry: expected-depth term + distortion's
            # m-chain (dm/dd = far·near / ((far-near) d²), gated at the
            # d <= 1e-6 clamp)
            g_m = g_dist * 2.0 * w * (m * a_tot - s1_tot)
            dmdd = jnp.where(
                depth > 1e-6,
                (common.FAR_PLANE * common.NEAR_PLANE)
                / ((common.FAR_PLANE - common.NEAR_PLANE)
                   * depth_pos * depth_pos),
                0.0,
            )
            g_depth = jnp.where(ok, w * g_d + g_m * dmdd, 0.0)

            # rho3d branch: rho3d = (px^2+py^2)/pz^2 ; depth3d = q/pz.
            # ipz/rho3d can be inf (or huge) for near-degenerate conics;
            # their cotangents are exactly zero there (ok=False zeroes
            # g_rho/g_depth) but inf*0=NaN, so gate the values too
            ipz_g = jnp.where(ok, ipz, 0.0)
            ipz2_g = ipz_g * ipz_g
            rho3d_g = jnp.where(ok, rho3d, 0.0)
            g_rho3 = jnp.where(use3d, g_rho, 0.0)
            g_rho2 = jnp.where(use3d, 0.0, g_rho)
            g_d3 = jnp.where(use3d, g_depth, 0.0)
            g_d2 = jnp.where(use3d, 0.0, g_depth)
            # p cotangents (`depth` already equals q*ipz where use3d & ok)
            g_px = 2.0 * px_ * ipz2_g * g_rho3
            g_py = 2.0 * py_ * ipz2_g * g_rho3
            g_pz = -(2.0 * rho3d_g * g_rho3 + depth * g_d3) * ipz_g
            # q (3D depth numerator) and Tw.z (2D depth) cotangents
            g_q = ipz_g * g_d3
            # p = A + px*B + py*C and rho2d = pq + e0 + px*e1 + py*e2: the
            # slab-row grads are pixel sums of g_p / g_rho2 against the
            # monomials {1, px, py} (in `rows` below); Tu/Tv/Tw/center2d
            # then chain through pack_props by autodiff in the epilogue.

            g_rgb = (w * g_c[0], w * g_c[1], w * g_c[2])
            g_nrm = (w * g_n[0], w * g_n[1], w * g_n[2])

            # reduce over pixels -> per-entry grads (1, CHUNK), place in rows
            def psum(x):
                return jnp.sum(jnp.where(ok, x, 0.0), axis=0, keepdims=True)

            # retire the write issued two chunks ago before reusing its slot
            @pl.when(ci >= 2)
            def _():
                gwrite(ci - 2, slot).wait()

            rows = [
                (psum(g_px), _PA), (psum(g_py), _PA + 1), (psum(g_pz), _PA + 2),
                (psum(pxf * g_px), _PB), (psum(pxf * g_py), _PB + 1), (psum(pxf * g_pz), _PB + 2),
                (psum(pyf * g_px), _PC), (psum(pyf * g_py), _PC + 1), (psum(pyf * g_pz), _PC + 2),
                (psum(g_q), _QD), (psum(g_d2), _TW2),
                (psum(g_rho2), _E0),
                (psum(pxf * g_rho2), _E1), (psum(pyf * g_rho2), _E2),
                (psum(g_opac), _OPAC),
                (psum(g_rgb[0]), _RGB), (psum(g_rgb[1]), _RGB + 1), (psum(g_rgb[2]), _RGB + 2),
                (psum(g_nrm[0]), _NRM), (psum(g_nrm[1]), _NRM + 1), (psum(g_nrm[2]), _NRM + 2),
            ] + [
                (psum(w * g_extra[e]), _EXTRA + e) for e in range(n_extra)
            ]
            for val, r in rows:
                gscratch[slot, r, :] = val[0]
            # rows between the used set and the sublane-rounded ng carry
            # stale data from the previous chunk in this slot — zero them
            zero_row = jnp.zeros((CHUNK,), jnp.float32)
            for r in range(_EXTRA + n_extra, ng):
                gscratch[slot, r, :] = zero_row
            gwrite(ci, slot).start()

            # carry: t_before of the FIRST lane = T after all earlier entries
            t_after2 = t_before[:, 0][:, None]
            s_gw2 = s_gw + jnp.sum(gww, axis=1, keepdims=True)
            return (t_after2, s_gw2)

        jax.lax.fori_loop(
            0, num_chunks, body,
            (t_fin * jnp.ones((px_n, 1), jnp.float32),
             jnp.zeros((px_n, 1), jnp.float32)),
        )

        # retire the trailing writes (the last chunk's, and the one before
        # it whose wait was skipped because no further gread reused its
        # slot) before the next grid step may read overlapping ranges
        @pl.when(num_chunks > 1)
        def _():
            gwrite(num_chunks - 2, jax.lax.rem(num_chunks - 2, 2)).wait()

        @pl.when(num_chunks > 0)
        def _():
            gwrite(num_chunks - 1, jax.lax.rem(num_chunks - 1, 2)).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "n_extra", "n_frames",
                     "interpret"),
)
def backward_pallas(
    slab: jax.Array,  # (N, 32, CHUNK) chunk-major prop slab (forward layout)
    tile_start: jax.Array,
    tile_count: jax.Array,
    cot: jax.Array,  # (num_tiles, px_n, 10+X): gC(3) gD gA gN(3) gBGdot gDist gX
    resid: jax.Array,  # (num_tiles, px_n, 4): T_fin, n_contrib, S1, S2
    height: int,
    width: int,
    tile: int = 16,
    n_extra: int = 0,
    n_frames: int = 1,
    interpret: bool = False,
    tile_ids: jax.Array = None,
) -> jax.Array:
    """Per-entry gradient slab (N, 32, CHUNK), same layout as the input."""
    tiles_y, tiles_x = common.tile_grid_shape(height, width, tile)
    num_tiles = tile_start.shape[0]
    px_n = tile * tile
    n_chunks = slab.shape[0]
    n_entries = n_chunks * CHUNK
    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    kernel = _make_bwd_kernel(
        tiles_x, tile, n_entries, n_extra=n_extra,
        n_tiles_per_frame=(tiles_x * tiles_y if n_frames > 1 else 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # props slab
            pl.BlockSpec((1, px_n, 10 + n_extra), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, px_n, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # zero-init grads (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, _F, CHUNK), jnp.float32),  # double-buffered props
            # double-buffered grads WRITE slab (only used rows travel,
            # rounded up to the sublane tiling; aligned segments make the
            # chunks exclusive to one tile — no RMW)
            pltpu.VMEM((2, -(-(_EXTRA + n_extra) // 8) * 8, CHUNK),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),  # grads writes
        ],
    )
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, _F, CHUNK), jnp.float32),
        input_output_aliases={6: 0},  # zeros input (after 3 scalar-prefetch + 3 operands) aliases the output
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(tile_ids, tile_start, tile_count, slab, cot, resid,
      jnp.zeros((n_chunks, _F, CHUNK), jnp.float32))
    return grads


# ---------------------------------------------------------------------------
# custom-VJP wrapper: Pallas forward + Pallas backward on the training path
# ---------------------------------------------------------------------------


def _make_core(tiles_x: int, tiles_y: int, tile: int, interpret: bool,
               n_extra: int = 0, n_frames: int = 1):
    from vidu4d_tpu.ops.rasterize.pallas_kernel import forward_tiles_pallas

    px_n = tile * tile

    @jax.custom_vjp
    def core(slab, tile_start, tile_count, tile_ids, bg):
        color, aux = forward_tiles_pallas(
            slab, tile_start, tile_count, bg, tiles_x, tiles_y, tile,
            n_extra=n_extra, n_frames=n_frames, interpret=interpret,
            tile_ids=tile_ids,
        )
        return color, aux[..., :8]

    def fwd(slab, tile_start, tile_count, tile_ids, bg):
        color, aux = forward_tiles_pallas(
            slab, tile_start, tile_count, bg, tiles_x, tiles_y, tile,
            n_extra=n_extra, n_frames=n_frames, interpret=interpret,
            tile_ids=tile_ids,
        )
        resid = aux[..., 8:12]  # t_fin, n_contrib, S1, S2
        return (color, aux[..., :8]), (
            slab, tile_start, tile_count, tile_ids, bg, resid
        )

    def bwd(res, cots):
        slab, tile_start, tile_count, tile_ids, bg, resid = res
        g_color, g_aux = cots  # g_color: (t, px, 3 + n_extra)
        # supported cotangents: color (+extras), depth(0), alpha(1),
        # normal(2:5), distortion(6). median depth/weight cotangents are
        # dropped (never supervised: depth_ratio=0 in the reference,
        # arguments/__init__.py:68).
        g_bgdot = jnp.einsum("tpc,c->tp", g_color, bg)[..., None]
        cot = jnp.concatenate(
            [g_color[..., :3], g_aux[..., 0:1], g_aux[..., 1:2],
             g_aux[..., 2:5], g_bgdot, g_aux[..., 6:7], g_color[..., 3:]],
            axis=-1,
        )
        height = tiles_y * tile
        width = tiles_x * tile
        g_slab = backward_pallas(
            slab, tile_start, tile_count, cot, resid, height, width,
            tile=tile, n_extra=n_extra, n_frames=n_frames,
            interpret=interpret, tile_ids=tile_ids,
        )
        t_fin = resid[..., 0]
        g_bg = jnp.einsum("tp,tpc->c", t_fin, g_color)
        zero_i = jnp.zeros(tile_start.shape, jax.dtypes.float0)
        zero_c = jnp.zeros(tile_count.shape, jax.dtypes.float0)
        zero_t = jnp.zeros(tile_ids.shape, jax.dtypes.float0)
        return g_slab, zero_i, zero_c, zero_t, g_bg

    core.defvjp(fwd, bwd)
    return core


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "span_cap", "interpret",
                     "entry_cap"),
)
def rasterize_pallas_grad(
    proj,
    colors,
    opacities,
    bg_color,
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
    interpret: bool = False,
    entry_cap: int = 0,
):
    """Differentiable Pallas rasterization (fwd + analytic bwd kernels).

    Returns a CompositeOutput; gradients flow to proj fields / colors /
    opacities / bg through the slab gather (XLA transposes it to the
    scatter-add that `backward.cu` does with atomics)."""
    from vidu4d_tpu.ops.rasterize.compositing import CompositeOutput
    from vidu4d_tpu.ops.rasterize.pallas_kernel import pack_props

    tiles_y, tiles_x = common.tile_grid_shape(height, width, tile)
    n_extra = colors.shape[-1] - 3
    if _FUSED_BINNING:
        binning = common.bin_splats_aligned(
            proj, height, width, tile=tile, span_cap=span_cap,
            chunk=CHUNK, entry_cap=entry_cap)
    else:
        binning = common.bin_splats(
            proj, height, width, tile=tile, span_cap=span_cap)
        binning = common.cap_binning(binning, entry_cap, chunk=CHUNK)
        binning = common.align_binning(binning, chunk=CHUNK)
    slab = pack_props(proj, colors, opacities, binning.sorted_splat_ids)
    core = _make_core(tiles_x, tiles_y, tile, interpret, n_extra=n_extra)
    nchan = 3 + n_extra
    bg = jnp.concatenate(
        [bg_color[:nchan],
         jnp.zeros((max(0, nchan - bg_color.shape[0]),), bg_color.dtype)]
    )
    tile_ids = jnp.arange(binning.tile_start.shape[0], dtype=jnp.int32)
    color, aux = core(slab, binning.tile_start, binning.tile_count, tile_ids, bg)

    def assemble(x):
        feat = x.shape[2:]
        img = x.reshape((tiles_y, tiles_x, tile, tile) + feat)
        img = jnp.swapaxes(img, 1, 2).reshape(
            (tiles_y * tile, tiles_x * tile) + feat
        )
        return img[:height, :width]

    color = assemble(color)
    aux = assemble(aux)
    return CompositeOutput(
        color=color,
        depth=aux[..., 0],
        alpha=aux[..., 1],
        normal=aux[..., 2:5],
        median_depth=jax.lax.stop_gradient(aux[..., 5]),
        distortion=aux[..., 6],
        median_weight=jax.lax.stop_gradient(aux[..., 7]),
        final_t=1.0 - aux[..., 1],
    )


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "span_cap", "interpret",
                     "mesh", "shard_axes", "entry_cap"),
)
def rasterize_pallas_grad_batch(
    proj_b,  # SplatProjection with (M, P, ...) fields (vmapped projection)
    colors_b: jax.Array,  # (M, P, C)
    opacities: jax.Array,  # (P,)
    bg_color: jax.Array,  # (C,) shared across frames
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
    interpret: bool = False,
    mesh=None,
    shard_axes: tuple = ("data", "surfel"),
    entry_cap: int = 0,
):
    """Differentiable batched Pallas rasterization: the frame dim is folded
    into the kernel grid (grid = M * num_tiles over one concatenated entry
    slab) instead of a vmap of per-frame launches — ONE fwd and ONE bwd
    kernel launch per training step, and no reliance on pallas_call batching
    rules. Returns a CompositeOutput with (M, H, W, ...) fields.

    mesh: optional jax.sharding.Mesh — the multi-chip path (VERDICT r2 #4).
    The (frame, tile) grid is partitioned over the flattened ``shard_axes``
    via shard_map: every device receives the full packed slab (one
    all-gather — the slab is data, not parameters) and composites its slice
    of the tile grid with the same fused kernels; the backward accumulates a
    per-device entry-grad slab that shard_map's transpose psums (the
    replicated-input cotangent rule). This is the shard_map analog of the
    reference's per-GPU rasterizer under DDP (`lab4d/train.py:20-42`)."""
    from vidu4d_tpu.ops.rasterize.compositing import CompositeOutput
    from vidu4d_tpu.ops.rasterize.pallas_kernel import pack_props

    tiles_y, tiles_x = common.tile_grid_shape(height, width, tile)
    num_tiles = tiles_x * tiles_y
    m = proj_b.depth.shape[0]
    n_extra = colors_b.shape[-1] - 3

    if _FUSED_BINNING:
        binning = common.bin_splats_aligned_batch(
            proj_b, height, width, tile=tile, span_cap=span_cap,
            chunk=CHUNK, entry_cap=entry_cap)
    else:
        binning = common.bin_splats_batch(proj_b, height, width, tile=tile,
                                          span_cap=span_cap)
        binning = common.cap_binning(binning, entry_cap, chunk=CHUNK)
        binning = common.align_binning(binning, chunk=CHUNK)
    opac_b = jnp.broadcast_to(opacities[None], colors_b.shape[:2])
    # unrolled like bin_splats_batch: a vmapped gather's transpose is a
    # *batched* scatter-add, which XLA lowers far slower than M independent
    # scatters (same pathology as the batched sort)
    slab_b = jnp.stack([
        pack_props(jax.tree.map(lambda x: x[f], proj_b), colors_b[f],
                   opac_b[f], binning.sorted_splat_ids[f])
        for f in range(m)
    ])  # (M, N, 32, CHUNK) chunk-major per frame
    e_pad = slab_b.shape[1] * slab_b.shape[3]  # entries per frame segment
    slab = slab_b.reshape((-1,) + slab_b.shape[2:])  # (M*N, 32, CHUNK)
    offs = (jnp.arange(m, dtype=jnp.int32) * e_pad)[:, None]
    tile_start = (binning.tile_start + offs).reshape(-1)
    tile_count = binning.tile_count.reshape(-1)

    nchan = 3 + n_extra
    bg = jnp.concatenate(
        [bg_color[:nchan],
         jnp.zeros((max(0, nchan - bg_color.shape[0]),), bg_color.dtype)]
    )
    core = _make_core(tiles_x, tiles_y, tile, interpret, n_extra=n_extra,
                      n_frames=m)
    tile_ids = jnp.arange(tile_start.shape[0], dtype=jnp.int32)

    if mesh is not None:
        import numpy as np
        from jax.sharding import PartitionSpec as P

        axes = tuple(a for a in shard_axes if a in mesh.shape)
        ndev = int(np.prod([mesh.shape[a] for a in axes])) if axes else 1
        if ndev > 1 and tile_start.shape[0] % ndev == 0:
            spec_t = P(axes)
            run = jax.shard_map(
                core, mesh=mesh,
                in_specs=(P(None, None, None), spec_t, spec_t, spec_t,
                          P(None)),
                out_specs=(P(axes, None, None), P(axes, None, None)),
                check_vma=False,
            )
            color, aux = run(slab, tile_start, tile_count, tile_ids, bg)
        else:
            color, aux = core(slab, tile_start, tile_count, tile_ids, bg)
    else:
        color, aux = core(slab, tile_start, tile_count, tile_ids, bg)

    def assemble(x):
        feat = x.shape[2:]
        img = x.reshape((m, tiles_y, tiles_x, tile, tile) + feat)
        img = jnp.swapaxes(img, 2, 3).reshape(
            (m, tiles_y * tile, tiles_x * tile) + feat
        )
        return img[:, :height, :width]

    color = assemble(color)
    aux = assemble(aux)
    return CompositeOutput(
        color=color,
        depth=aux[..., 0],
        alpha=aux[..., 1],
        normal=aux[..., 2:5],
        median_depth=jax.lax.stop_gradient(aux[..., 5]),
        distortion=aux[..., 6],
        median_weight=jax.lax.stop_gradient(aux[..., 7]),
        final_t=1.0 - aux[..., 1],
    )
