"""Tiled differentiable 2DGS rasterizer in pure XLA.

The production-shape implementation: splats are binned to tiles
(`common.bin_splats`), then each tile gathers its front-most ``budget``
depth-sorted entries and composites them with vectorized prefix ops
(`compositing.composite`). Tiles are processed in vmapped chunks under
`lax.map` with rematerialization, so backward recomputes the per-tile alphas
instead of storing (tiles, budget, pixels) residuals.

This serves as the always-correct autodiff baseline and the correctness
oracle for the Pallas kernel; on small scenes it is also plenty fast (the
inner math is pure VPU work XLA fuses well).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.rasterize import common
from vidu4d_tpu.ops.rasterize.compositing import (
    CompositeOutput,
    composite,
    splat_pixel_response,
)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "span_cap", "budget", "tile_chunk"),
)
def rasterize_tiles_from_projection(
    proj: common.SplatProjection,
    colors: jax.Array,  # (P, C)
    opacities: jax.Array,  # (P,)
    bg_color: jax.Array,  # (C,)
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
    budget: int = 1024,
    tile_chunk: int = 8,
) -> CompositeOutput:
    """Render from projected splats. All shape params are static.

    budget: max depth-sorted entries composited per tile. Entries beyond it
        are dropped from the *back*; with the reference's T<1e-4 early-out
        anything behind a few hundred front splats contributes nothing, so a
        budget of ~1-2k reproduces unbounded compositing in practice (and the
        truncation count is observable via binning.tile_count > budget).
    """
    p = proj.depth.shape[0]
    nchan = colors.shape[-1]
    tiles_y, tiles_x = common.tile_grid_shape(height, width, tile)
    num_tiles = tiles_x * tiles_y

    binning = common.bin_splats(proj, height, width, tile=tile, span_cap=span_cap)
    sorted_ids = binning.sorted_splat_ids
    n_entries = sorted_ids.shape[0]

    # in-tile pixel offsets (+0.5 pixel centers)
    ty_off, tx_off = jnp.meshgrid(
        jnp.arange(tile, dtype=proj.tu.dtype),
        jnp.arange(tile, dtype=proj.tu.dtype),
        indexing="ij",
    )
    pix_off = jnp.stack([tx_off + 0.5, ty_off + 0.5], axis=-1).reshape(-1, 2)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    pad_tiles = (-num_tiles) % tile_chunk
    tile_ids = jnp.concatenate([tile_ids, jnp.zeros((pad_tiles,), jnp.int32)])

    @jax.checkpoint
    def render_tile(tile_id):
        start = binning.tile_start[tile_id]
        count = jnp.minimum(binning.tile_count[tile_id], budget)
        offs = jnp.arange(budget, dtype=jnp.int32)
        entry_ok = offs < count
        ids = sorted_ids[jnp.clip(start + offs, 0, n_entries - 1)]

        tu = proj.tu[ids][:, None, :]
        tv = proj.tv[ids][:, None, :]
        tw = proj.tw[ids][:, None, :]
        c2d = proj.center2d[ids][:, None, :]
        opac = jnp.where(entry_ok, opacities[ids], 0.0)[:, None]
        col = colors[ids][:, None, :]
        nrm = proj.normal[ids][:, None, :]

        base_x = (tile_id % tiles_x) * tile
        base_y = (tile_id // tiles_x) * tile
        pix = pix_off + jnp.stack([base_x, base_y]).astype(pix_off.dtype)[None, :]

        alpha, depth = splat_pixel_response(tu, tv, tw, c2d, opac, pix[None, :, :])
        return composite(alpha, depth, col, nrm, bg_color)

    def chunk_fn(ids_chunk):
        return jax.vmap(render_tile)(ids_chunk)

    out = jax.lax.map(chunk_fn, tile_ids.reshape(-1, tile_chunk))
    # (n_chunks, tile_chunk, tile*tile, ...) -> (num_tiles_padded, tile*tile, ...)
    out = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), out)

    def assemble(x):
        feat = x.shape[2:]
        x = x[:num_tiles].reshape((tiles_y, tiles_x, tile, tile) + feat)
        x = jnp.swapaxes(x, 1, 2)
        x = x.reshape((tiles_y * tile, tiles_x * tile) + feat)
        return x[:height, :width]

    return jax.tree.map(assemble, out)
