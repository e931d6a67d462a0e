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


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "span_cap", "budget",
                     "tile_chunk", "mesh", "shard_axes"),
)
def rasterize_tiles_batch(
    proj_b: common.SplatProjection,  # (M, P, ...) vmapped projection
    colors_b: jax.Array,  # (M, P, C)
    opacities: jax.Array,  # (P,) shared across frames
    bg_color: jax.Array,  # (C',) shared; zero-padded to C if colors wider
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
    budget: int = 1024,
    tile_chunk: int = 8,
    mesh=None,
    shard_axes: tuple = ("data", "surfel"),
) -> CompositeOutput:
    """Batched tiles rasterizer whose (frame, tile) grid partitions over a
    device mesh.

    The per-frame `rasterize_tiles_from_projection` runs its tile loop under
    `lax.map` — a sequential scan GSPMD cannot partition, so under a mesh the
    whole rasterization replicates on every surfel-axis device (the measured
    CPU-mesh regression: 0.73x at n=4). Here the flattened M*num_tiles tile
    list is instead split across ALL mesh axes via shard_map (same design as
    `rasterize_pallas_grad_batch`): each device composites its slice of
    tiles against the full (replicated) splat set, and the backward's
    cotangents for those replicated inputs are psum'd by shard_map's
    transpose. This is what makes the tiles backend — the CPU/multi-chip
    fallback path — strong-scale instead of regress.

    Reference analog: per-GPU tile rasterization under DDP
    (`lab4d/train.py:20-42` + `diff-surfel-rasterization` per replica).
    """
    m, p = proj_b.depth.shape[:2]
    nchan = colors_b.shape[-1]
    tiles_y, tiles_x = common.tile_grid_shape(height, width, tile)
    num_tiles = tiles_x * tiles_y

    binning = common.bin_splats_batch(proj_b, height, width, tile=tile,
                                      span_cap=span_cap)
    n_entries = binning.sorted_splat_ids.shape[-1]

    bg = jnp.concatenate(
        [bg_color[:nchan],
         jnp.zeros((max(0, nchan - bg_color.shape[0]),), bg_color.dtype)]
    )

    ty_off, tx_off = jnp.meshgrid(
        jnp.arange(tile, dtype=proj_b.tu.dtype),
        jnp.arange(tile, dtype=proj_b.tu.dtype),
        indexing="ij",
    )
    pix_off = jnp.stack([tx_off + 0.5, ty_off + 0.5], axis=-1).reshape(-1, 2)

    # flat (frame, tile) grid, per-frame padded so every device gets whole
    # chunks; padded slots re-render tile 0 and are dropped by assemble
    ndev = 1
    if mesh is not None:
        axes = tuple(a for a in shard_axes if a in mesh.shape)
        for a in axes:
            ndev *= mesh.shape[a]
    grain = tile_chunk * ndev
    tiles_pad = num_tiles + ((-num_tiles) % grain)
    gids = (jnp.arange(m * tiles_pad, dtype=jnp.int32))

    def render_tile(gid, sorted_ids, tile_start, tile_count,
                    tu_a, tv_a, tw_a, c2d_a, nrm_a, cols_a, opac_a):
        f = gid // tiles_pad
        tile_id = jnp.minimum(gid % tiles_pad, num_tiles - 1)
        start = tile_start[f, tile_id]
        count = jnp.minimum(tile_count[f, tile_id], budget)
        offs = jnp.arange(budget, dtype=jnp.int32)
        entry_ok = offs < count
        ids = sorted_ids[f, jnp.clip(start + offs, 0, n_entries - 1)]

        tu = tu_a[f, ids][:, None, :]
        tv = tv_a[f, ids][:, None, :]
        tw = tw_a[f, ids][:, None, :]
        c2d = c2d_a[f, ids][:, None, :]
        opac = jnp.where(entry_ok, opac_a[ids], 0.0)[:, None]
        col = cols_a[f, ids][:, None, :]
        nrm = nrm_a[f, ids][:, None, :]

        base_x = (tile_id % tiles_x) * tile
        base_y = (tile_id // tiles_x) * tile
        pix = pix_off + jnp.stack([base_x, base_y]).astype(pix_off.dtype)[None, :]
        alpha, depth = splat_pixel_response(tu, tv, tw, c2d, opac, pix[None, :, :])
        return composite(alpha, depth, col, nrm, bg)

    def core(gids_slice, *arrays):
        def chunk_fn(ids_chunk):
            return jax.vmap(
                lambda g: jax.checkpoint(render_tile)(g, *arrays)
            )(ids_chunk)

        out = jax.lax.map(chunk_fn, gids_slice.reshape(-1, tile_chunk))
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), out)

    arrays = (binning.sorted_splat_ids, binning.tile_start,
              binning.tile_count, proj_b.tu, proj_b.tv, proj_b.tw,
              proj_b.center2d, proj_b.normal, colors_b, opacities)

    if ndev > 1:
        from jax.sharding import PartitionSpec as P

        spec_t = P(axes)
        run = jax.shard_map(
            core, mesh=mesh,
            in_specs=(spec_t,) + tuple(P() for _ in arrays),
            out_specs=jax.tree.map(lambda _: spec_t, CompositeOutput(
                *[0] * len(CompositeOutput._fields))),
            check_vma=False,
        )
        out = run(gids, *arrays)
    else:
        out = core(gids, *arrays)

    def assemble(x):
        feat = x.shape[2:]
        x = x.reshape((m, tiles_pad) + x.shape[1:])[:, :num_tiles]
        x = x.reshape((m, tiles_y, tiles_x, tile, tile) + feat)
        x = jnp.swapaxes(x, 2, 3)
        x = x.reshape((m, tiles_y * tile, tiles_x * tile) + feat)
        return x[:, :height, :width]

    return jax.tree.map(assemble, out)
