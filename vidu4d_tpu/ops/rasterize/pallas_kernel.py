"""Hand-written Pallas TPU kernel for per-tile surfel compositing (forward).

The production rendering path: replaces the per-tile gather + cumprod XLA
graph (`xla_tiles.py`) with one fused kernel that streams depth-sorted
entries from HBM and composites them with in-register prefix ops:

* grid = one program per 16x16 tile;
* the sorted per-entry property slab is stored transposed, (32, E): entries
  ride the 128-wide lane dimension, so each chunk is one lane-aligned
  (32, 128) DMA — no unaligned memref slicing;
* per chunk: evaluate all 256 x 128 splat-pixel responses on the VPU
  (broadcasted two-plane intersection, exactly `forward.cu:359-382`), then a
  Hillis-Steele prefix product along lanes gives the transmittance chain
  without a sequential loop;
* the reference's per-pixel early-out (`forward.cu:401-406`) is exact:
  entries past the T<1e-4 point contribute identically zero through the
  include mask (the loop bound already limits work to the tile's entries);
* depth/normal/median/distortion auxiliaries accumulate in carries matching
  the 8-channel out_others contract (`auxiliary.h:25-30`).

Gradients: `pallas_backward.rasterize_pallas_grad` pairs this forward with
the analytic backward kernel via jax.custom_vjp; the autodiff XLA path
(`xla_tiles.py`) remains available and pins both in parity tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidu4d_tpu.ops.rasterize import common
from vidu4d_tpu.ops.rasterize.compositing import CompositeOutput

# property slab rows (per sorted entry), padded to 32 rows
_F = 32
_TU = 0
_TV = 3
_TW = 6
_CX = 9
_CY = 10
_OPAC = 11
_RGB = 12
_NRM = 15

CHUNK = 128  # entries per chunk == lane width (DMA stays lane-aligned)


def _prefix_mul_lanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix product along the lane axis (axis 1), Hillis-Steele."""
    k = x.shape[1]
    steps = int(math.log2(k))
    assert 2 ** steps == k
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s in range(steps):
        shift = 1 << s
        shifted = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(col >= shift, shifted, 1.0)
    return x


def _prefix_add_lanes(x: jax.Array) -> jax.Array:
    k = x.shape[1]
    steps = int(math.log2(k))
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s in range(steps):
        shift = 1 << s
        shifted = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(col >= shift, shifted, 0.0)
    return x


def _make_kernel(tiles_x: int, tile: int, n_entries: int):
    px_n = tile * tile

    def kernel(start_ref, count_ref, props_hbm, bg_ref,
               color_ref, aux_ref, scratch, sem):
        t = pl.program_id(0)
        start = start_ref[t]
        count = count_ref[t]
        base_x = (t % tiles_x) * tile
        base_y = (t // tiles_x) * tile

        # pixel centers on the sublane axis: (px_n, 1)
        lin = jax.lax.broadcasted_iota(jnp.int32, (px_n, 1), 0)
        pxf = (base_x + lin % tile).astype(jnp.float32) + 0.5
        pyf = (base_y + lin // tile).astype(jnp.float32) + 0.5

        # chunks start lane-aligned; masks trim [start, start+count)
        base0 = (start // CHUNK) * CHUNK
        num_chunks = jnp.where(
            count > 0, pl.cdiv(start + count - base0, CHUNK), 0
        )

        def chunk_base(c):
            base = jnp.minimum(base0 + c * CHUNK, n_entries - CHUNK)
            return pl.multiple_of(base, CHUNK)

        def chunk_copy(c, slot):
            return pltpu.make_async_copy(
                props_hbm.at[:, pl.ds(chunk_base(c), CHUNK)],
                scratch.at[slot], sem.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            chunk_copy(0, 0).start()

        zeros = jnp.zeros((px_n, 1), jnp.float32)
        carry0 = (
            jnp.ones((px_n, 1), jnp.float32),  # T
            zeros, zeros, zeros,  # color r, g, b
            zeros,  # expected depth
            zeros, zeros, zeros,  # normal x, y, z
            zeros, zeros,  # dist1, dist2
            zeros,  # distortion
            zeros, zeros,  # med_depth, med_w
            zeros,  # n_contrib (last composited rank + 1)
        )

        def cond(state):
            c, tmax, _ = state
            # tile-level early-out (forward.cu:401-406 generalized to the
            # whole tile): once every pixel's T dropped below the stop
            # threshold, remaining chunks contribute exactly zero.
            return (c < num_chunks) & (tmax >= common.T_EARLY_STOP)

        def body(state):
            c, _, carry = state
            (t_c, cr, cg, cb, d_acc, nx, ny, nz,
             dist1, dist2, distort, med_d, med_w, ncon) = carry

            slot = jax.lax.rem(c, 2)
            # prefetch the next chunk into the other buffer; its DMA rides
            # under this chunk's compute (double buffering)
            @pl.when(c + 1 < num_chunks)
            def _():
                chunk_copy(c + 1, 1 - slot).start()

            chunk_copy(c, slot).wait()
            base = chunk_base(c)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            entry_id = base + lane
            valid_k = (entry_id >= start) & (entry_id < start + count)

            row = lambda i: scratch[slot, i, :][None, :]  # (1, CHUNK)
            # two-plane intersection (forward.cu:359-372); (px_n, CHUNK)
            kx = pxf * row(_TW) - row(_TU)
            ky = pxf * row(_TW + 1) - row(_TU + 1)
            kz = pxf * row(_TW + 2) - row(_TU + 2)
            lx = pyf * row(_TW) - row(_TV)
            ly = pyf * row(_TW + 1) - row(_TV + 1)
            lz = pyf * row(_TW + 2) - row(_TV + 2)
            px_ = ky * lz - kz * ly
            py_ = kz * lx - kx * lz
            pz_ = kx * ly - ky * lx
            pz_ok = pz_ != 0.0
            pz_safe = jnp.where(pz_ok, pz_, 1.0)
            sx = px_ / pz_safe
            sy = py_ / pz_safe
            rho3d = sx * sx + sy * sy
            dx = row(_CX) - pxf
            dy = row(_CY) - pyf
            rho2d = common.FILTER_INV_SQUARE * (dx * dx + dy * dy)
            rho = jnp.minimum(rho3d, rho2d)
            depth = jnp.where(
                rho3d <= rho2d,
                sx * row(_TW) + sy * row(_TW + 1) + row(_TW + 2),
                jnp.broadcast_to(row(_TW + 2), rho3d.shape),
            )
            alpha = jnp.minimum(
                common.ALPHA_CLAMP, row(_OPAC) * jnp.exp(-0.5 * rho)
            )
            ok = (
                pz_ok & (depth >= common.NEAR_PLANE)
                & (alpha >= common.ALPHA_EPS) & valid_k
            )
            alpha = jnp.where(ok, alpha, 0.0)  # (px_n, CHUNK)

            om = 1.0 - alpha
            cp_incl = _prefix_mul_lanes(om)
            t_incl = t_c * cp_incl
            include = t_incl >= common.T_EARLY_STOP
            colid = jax.lax.broadcasted_iota(jnp.int32, om.shape, 1)
            t_prefix = t_c * jnp.where(
                colid == 0, 1.0, pltpu.roll(cp_incl, 1, axis=1)
            )
            w = alpha * t_prefix * jnp.where(include, 1.0, 0.0)

            lsum = lambda x: jnp.sum(x, axis=1, keepdims=True)
            cr2 = cr + lsum(w * row(_RGB))
            cg2 = cg + lsum(w * row(_RGB + 1))
            cb2 = cb + lsum(w * row(_RGB + 2))
            d2_ = d_acc + lsum(w * depth)
            nx2 = nx + lsum(w * row(_NRM))
            ny2 = ny + lsum(w * row(_NRM + 1))
            nz2 = nz + lsum(w * row(_NRM + 2))

            # streaming distortion (forward.cu:410-436)
            depth_pos = jnp.maximum(depth, 1e-6)
            m = (common.FAR_PLANE * depth_pos
                 - common.FAR_PLANE * common.NEAR_PLANE) / (
                (common.FAR_PLANE - common.NEAR_PLANE) * depth_pos)
            wm = w * m
            wmm = w * m * m
            dist1_pre = dist1 + _prefix_add_lanes(wm) - wm  # exclusive
            dist2_pre = dist2 + _prefix_add_lanes(wmm) - wmm
            acc_a = 1.0 - t_prefix
            err = m * m * acc_a + dist2_pre - 2.0 * m * dist1_pre
            distort2 = distort + lsum(w * err)
            dist1_2 = dist1 + lsum(wm)
            dist2_2 = dist2 + lsum(wmm)

            # median: last composited entry with T(before) > 0.5
            cand = (w > 0) & (t_prefix > 0.5)
            last = jnp.max(jnp.where(cand, colid, -1), axis=1, keepdims=True)
            sel = (colid == last) & cand
            has = last >= 0  # (bool reductions unsupported in Mosaic)
            med_d2 = jnp.where(has, lsum(jnp.where(sel, depth, 0.0)), med_d)
            med_w2 = jnp.where(has, lsum(jnp.where(sel, w, 0.0)), med_w)

            # T after the chunk = t_incl at the last included entry
            # (t_incl is non-increasing along lanes)
            t_c2 = jnp.min(
                jnp.where(include, t_incl, jnp.broadcast_to(t_c, t_incl.shape)),
                axis=1, keepdims=True,
            )
            # contributor count residual for the backward kernel
            rank1 = (entry_id - start + 1).astype(jnp.float32)
            ncon2 = jnp.maximum(
                ncon,
                jnp.max(jnp.where(w > 0, rank1, 0.0), axis=1, keepdims=True),
            )
            carry2 = (t_c2, cr2, cg2, cb2, d2_, nx2, ny2, nz2,
                      dist1_2, dist2_2, distort2, med_d2, med_w2, ncon2)
            return (c + 1, jnp.max(t_c2), carry2)

        _, _, carry_out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(1.0), carry0)
        )
        (t_c, cr, cg, cb, d_acc, nx, ny, nz,
         dist1, dist2, distort, med_d, med_w, ncon) = carry_out

        color_ref[0, :, 0] = (cr + t_c * bg_ref[0, 0])[:, 0]
        color_ref[0, :, 1] = (cg + t_c * bg_ref[0, 1])[:, 0]
        color_ref[0, :, 2] = (cb + t_c * bg_ref[0, 2])[:, 0]
        aux_ref[0, :, 0] = d_acc[:, 0]
        aux_ref[0, :, 1] = (1.0 - t_c)[:, 0]
        aux_ref[0, :, 2] = nx[:, 0]
        aux_ref[0, :, 3] = ny[:, 0]
        aux_ref[0, :, 4] = nz[:, 0]
        aux_ref[0, :, 5] = med_d[:, 0]
        aux_ref[0, :, 6] = distort[:, 0]
        aux_ref[0, :, 7] = med_w[:, 0]
        aux_ref[0, :, 8] = t_c[:, 0]
        aux_ref[0, :, 9] = ncon[:, 0]
        aux_ref[0, :, 10] = dist1[:, 0]  # S1 = sum w·m (bwd residual)
        aux_ref[0, :, 11] = dist2[:, 0]  # S2 = sum w·m²

    return kernel


def pack_props(proj: common.SplatProjection, colors, opacities,
               sorted_ids) -> jax.Array:
    """Gather per-splat props into the transposed (32, E_pad) slab."""
    ids = sorted_ids
    rows = [
        proj.tu[ids, 0], proj.tu[ids, 1], proj.tu[ids, 2],
        proj.tv[ids, 0], proj.tv[ids, 1], proj.tv[ids, 2],
        proj.tw[ids, 0], proj.tw[ids, 1], proj.tw[ids, 2],
        proj.center2d[ids, 0], proj.center2d[ids, 1],
        opacities[ids],
        colors[ids, 0], colors[ids, 1], colors[ids, 2],
        proj.normal[ids, 0], proj.normal[ids, 1], proj.normal[ids, 2],
    ]
    slab = jnp.stack(rows, axis=0)  # (18, E)
    slab = jnp.concatenate(
        [slab, jnp.zeros((_F - slab.shape[0], slab.shape[1]), jnp.float32)],
        axis=0,
    )
    # pad E to a CHUNK multiple + one spare chunk (clamped reads stay valid)
    e = slab.shape[1]
    pad = (-e) % CHUNK + CHUNK
    return jnp.pad(slab, ((0, 0), (0, pad)))


def forward_tiles_pallas(slab, tile_start, tile_count, bg_color,
                         tiles_x: int, tiles_y: int, tile: int,
                         interpret: bool = False):
    """Tile-space forward: returns (color (T,px,3), aux (T,px,12))."""
    num_tiles = tiles_x * tiles_y
    px_n = tile * tile
    n_entries = slab.shape[1]
    kernel = _make_kernel(tiles_x, tile, n_entries)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, px_n, 3), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, px_n, 12), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _F, CHUNK), jnp.float32),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, px_n, 3), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, px_n, 12), jnp.float32),
        ),
        interpret=interpret,
    )(tile_start, tile_count, slab, bg_color[None, :3])


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "span_cap", "interpret"),
)
def rasterize_pallas_from_projection(
    proj: common.SplatProjection,
    colors: jax.Array,
    opacities: jax.Array,
    bg_color: jax.Array,
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
    interpret: bool = False,
) -> CompositeOutput:
    """Forward rasterization via the Pallas kernel. Output contract matches
    `xla_tiles.rasterize_tiles_from_projection` (no per-tile entry budget:
    the kernel streams arbitrarily many entries per tile)."""
    tiles_y, tiles_x = common.tile_grid_shape(height, width, tile)
    px_n = tile * tile

    binning = common.bin_splats(proj, height, width, tile=tile, span_cap=span_cap)
    slab = pack_props(proj, colors, opacities, binning.sorted_splat_ids)
    color, aux = forward_tiles_pallas(
        slab, binning.tile_start, binning.tile_count, bg_color,
        tiles_x, tiles_y, tile, interpret=interpret,
    )

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
        median_depth=aux[..., 5],
        distortion=aux[..., 6],
        median_weight=aux[..., 7],
        final_t=1.0 - aux[..., 1],
    )
