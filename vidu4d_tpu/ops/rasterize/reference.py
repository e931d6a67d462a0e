"""Naive O(P·H·W) rasterizer oracle — correctness reference for the tiled
implementations (test-only; differentiable, but materializes (P, H·W)).

Composites *all* splats at *all* pixels in globally depth-sorted order, with
the same tile-rect membership rule the binned implementations use (a splat
only touches pixels whose tile lies in its clamped AABB rect), the same
quantized-depth sort keys, and the same stable tie-break by splat index — so
tiled outputs must match this bit-for-bit given sufficient budget.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.rasterize import common
from vidu4d_tpu.ops.rasterize.compositing import CompositeOutput, composite, splat_pixel_response


def rasterize_naive_from_projection(
    proj: common.SplatProjection,
    colors: jax.Array,  # (P, C)
    opacities: jax.Array,  # (P,)
    bg_color: jax.Array,  # (C,)
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
) -> CompositeOutput:
    p = proj.depth.shape[0]
    tiles_y, tiles_x = common.tile_grid_shape(height, width, tile)
    num_tiles = tiles_x * tiles_y
    tile_bits = max(1, math.ceil(math.log2(max(num_tiles, 2))))
    depth_bits = 30 - tile_bits

    # global stable depth order with the same quantization as the binned path
    depth_q = common.quantize_depth(proj.depth, depth_bits)
    order = jnp.argsort(depth_q, stable=True)

    rects = common.compute_tile_rects(proj, height, width, tile, span_cap)

    def g(x):
        return x[order]

    tu, tv, tw = g(proj.tu), g(proj.tv), g(proj.tw)
    center2d = g(proj.center2d)
    normal = g(proj.normal)
    color = g(colors)
    opacity = g(opacities)
    valid = g(rects.valid)
    min_x, min_y = g(rects.min_x), g(rects.min_y)
    span_x, span_y = g(rects.span_x), g(rects.span_y)

    # pixel grid and per-pixel tile coords
    ys, xs = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    pix = jnp.stack([xs + 0.5, ys + 0.5], axis=-1).reshape(-1, 2).astype(proj.tu.dtype)
    ptx = (xs // tile).reshape(-1)
    pty = (ys // tile).reshape(-1)

    alpha, depth = splat_pixel_response(
        tu[:, None, :], tv[:, None, :], tw[:, None, :],
        center2d[:, None, :], opacity[:, None], pix[None, :, :],
    )  # (P, HW)

    in_rect = (
        (ptx[None, :] >= min_x[:, None])
        & (ptx[None, :] < (min_x + span_x)[:, None])
        & (pty[None, :] >= min_y[:, None])
        & (pty[None, :] < (min_y + span_y)[:, None])
        & valid[:, None]
    )
    alpha = jnp.where(in_rect, alpha, 0.0)

    out = composite(alpha, depth, color[:, None, :], normal[:, None, :], bg_color)
    reshape = lambda x: x.reshape((height, width) + x.shape[1:])
    return CompositeOutput(*[reshape(f) for f in out])
