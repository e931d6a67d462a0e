"""Pseudo surface normals from a rendered depth map.

Camera-frame equivalent of the reference's `gs/utils/point_utils.py:9-38`
(depths_to_points / depth_to_normal) + the renderer's surf_depth/surf_normal
assembly (`gs/gaussian_renderer/__init__.py:120-152`): unproject the depth
map to camera-space points, take finite-difference tangents, normal = their
normalized cross product, zero on the 1-px border.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_points_cam(depth: jax.Array, intrins: jax.Array) -> jax.Array:
    """depth (H, W) + intrinsics (fx, fy, cx, cy) -> camera points (H, W, 3)."""
    h, w = depth.shape
    fx, fy, cx, cy = intrins[0], intrins[1], intrins[2], intrins[3]
    xs = jnp.arange(w, dtype=depth.dtype)
    ys = jnp.arange(h, dtype=depth.dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    rays = jnp.stack([(gx - cx) / fx, (gy - cy) / fy, jnp.ones_like(gx)], axis=-1)
    return rays * depth[..., None]


def depth_to_normal_cam(depth: jax.Array, intrins: jax.Array) -> jax.Array:
    """Depth map -> camera-space pseudo normals (H, W, 3), zero border.

    Matches `point_utils.depth_to_normal`: dx along image rows (y-direction
    central difference), dy along columns, n = normalize(dx × dy).
    """
    points = depth_to_points_cam(depth, intrins)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    n = n / jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-24))
    out = jnp.zeros_like(points)
    return out.at[1:-1, 1:-1].set(n)


def surf_depth_and_normal(
    depth_expected: jax.Array,  # (H, W) expected depth (already alpha-normalized)
    depth_median: jax.Array,  # (H, W)
    alpha: jax.Array,  # (H, W)
    intrins: jax.Array,
    depth_ratio: float = 0.0,
):
    """surf_depth mix + alpha-weighted pseudo normal
    (`gaussian_renderer/__init__.py:144-152`)."""
    surf_depth = depth_expected * (1.0 - depth_ratio) + depth_ratio * depth_median
    surf_normal = depth_to_normal_cam(surf_depth, intrins)
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)[..., None]
    return surf_depth, surf_normal
