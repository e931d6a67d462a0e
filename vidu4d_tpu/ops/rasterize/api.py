"""Public rasterizer API: the TPU-native replacement for the reference
`diff-surfel-rasterization` extension + `gs/gaussian_renderer` wrapper.

A single differentiable function from surfel parameters + camera to the
full 2DGS output contract (3 color channels + the 8 auxiliary channels of
`rasterize_points.cu:93` / `auxiliary.h:25-30`): expected depth, accumulated
alpha, 3-channel camera-space normal, median depth, distortion, median
weight. Arbitrary channel counts are supported (the reference is fixed at 3).

Gradients flow to means3d/quats/scales/opacities/colors(or SHs)/bg via XLA
autodiff, matching the hand-written CUDA backward semantics (verified against
the naive oracle in tests). The viewspace densification gradient signal is
obtained by differentiating wrt the ``densify_dummy`` zero input
(see `project_splats`), mirroring `backward.cu:599-649`'s mean2D hack.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops import sh as sh_ops
from vidu4d_tpu.ops.rasterize import common
from vidu4d_tpu.ops.rasterize.compositing import CompositeOutput
from vidu4d_tpu.ops.rasterize.reference import rasterize_naive_from_projection
from vidu4d_tpu.ops.rasterize.xla_tiles import rasterize_tiles_from_projection

RenderOutput = CompositeOutput


class RasterizeConfig(NamedTuple):
    tile: int = 16  # tile side in pixels (reference: 16, config.h:16-17)
    span_cap: int = 4  # max tiles per axis a splat may cover (static duplication)
    budget: int = 1024  # max composited entries per tile
    tile_chunk: int = 8  # tiles vmapped together inside lax.map
    # "tiles": differentiable XLA path (CPU + multi-chip GSPMD backend)
    # "pallas": fused streaming TPU kernel fwd (no per-tile budget)
    # "naive": O(P·HW) oracle (tests)
    impl: str = "tiles"
    # Pallas paths: static cap on SORTED entries packed per frame (0 = the
    # full P*span_cap^2 duplication). Valid entries sort to the front, so
    # results are EXACT whenever the frame's entry count stays under the
    # cap; beyond it the global tail (highest tile ids) drops and the
    # trainer's truncated_entries telemetry reports it. Shrinks the pack
    # gather / grads slab / backward scatter by ~P*span^2/cap.
    entry_cap: int = 0


def _camera_center(viewmat: jax.Array) -> jax.Array:
    rot = viewmat[:3, :3]
    return -rot.T @ viewmat[:3, 3]


def rasterize(
    means3d: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    viewmat: jax.Array,
    intrins: jax.Array,
    height: int,
    width: int,
    colors: Optional[jax.Array] = None,
    shs: Optional[jax.Array] = None,
    sh_degree: int = 0,
    bg_color: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    densify_dummy: Optional[jax.Array] = None,
    config: RasterizeConfig = RasterizeConfig(),
) -> RenderOutput:
    """Differentiable 2D-Gaussian-surfel rasterization.

    Args:
        means3d: (P, 3) world-space surfel centers.
        quats: (P, 4) rotations (w, x, y, z).
        scales: (P, 2) tangent standard deviations (post-activation).
        opacities: (P,) in [0, 1] (post-activation).
        viewmat: (4, 4) world-to-camera.
        intrins: (4,) (fx, fy, cx, cy) — arbitrary principal point supported.
        colors: (P, C) precomputed colors; or
        shs: (P, K, 3) SH coefficients evaluated at view directions.
        mask: (P,) bool alive-mask; dead slots are culled.
        densify_dummy: (P, 2) zeros; grad wrt it = viewspace densify signal.
    """
    if (colors is None) == (shs is None):
        raise ValueError("provide exactly one of colors / shs")
    if colors is None:
        colors = sh_ops.eval_sh_color(sh_degree, shs, means3d, _camera_center(viewmat))
    if bg_color is None:
        bg_color = jnp.zeros((colors.shape[-1],), dtype=colors.dtype)

    proj = common.project_splats(
        means3d, quats, scales, viewmat, intrins, mask=mask, densify_dummy=densify_dummy
    )
    if config.impl == "naive":
        return rasterize_naive_from_projection(
            proj, colors, opacities, bg_color, height, width,
            tile=config.tile, span_cap=config.span_cap,
        )
    if config.impl == "tiles":
        return rasterize_tiles_from_projection(
            proj, colors, opacities, bg_color, height, width,
            tile=config.tile, span_cap=config.span_cap,
            budget=config.budget, tile_chunk=config.tile_chunk,
        )
    if config.impl in ("pallas", "pallas_interpret"):
        from vidu4d_tpu.ops.rasterize.pallas_kernel import (
            rasterize_pallas_from_projection,
        )

        return rasterize_pallas_from_projection(
            proj, colors, opacities, bg_color, height, width,
            tile=config.tile, span_cap=config.span_cap,
            interpret=(config.impl == "pallas_interpret"),
        )
    if config.impl == "pallas_grad":
        from vidu4d_tpu.ops.rasterize.pallas_backward import (
            rasterize_pallas_grad,
        )

        return rasterize_pallas_grad(
            proj, colors, opacities, bg_color, height, width,
            tile=config.tile, span_cap=config.span_cap,
            entry_cap=config.entry_cap,
        )
    raise ValueError(f"unknown rasterizer impl {config.impl!r}")


def rasterize_naive(*args, config: RasterizeConfig = RasterizeConfig(), **kwargs):
    return rasterize(*args, config=config._replace(impl="naive"), **kwargs)
