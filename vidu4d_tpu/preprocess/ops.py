"""Core image ops for Stage-1 preprocessing (batched JAX).

Replaces the per-frame cv2.remap/compute_crop_params/flow_process host loops
(`preprocess/libs/io.py:113-230`, `lab4d/utils/geom_utils.py:192-222`) with
jittable, vmappable functions — whole videos are processed as one XLA graph
(the north star's "Stage 1 as batched XLA").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops import geometry as geom


def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample img (H, W, C) at float pixel coords x, y (...,). Clamps at
    borders (cv2.remap BORDER_CLAMP behavior for in-range queries)."""
    h, w = img.shape[:2]
    x = jnp.clip(x, 0.0, w - 1.000001)
    y = jnp.clip(y, 0.0, h - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - wx) * (1 - wy)
        + i01 * wx * (1 - wy)
        + i10 * (1 - wx) * wy
        + i11 * wx * wy
    )


def nearest_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    h, w = img.shape[:2]
    xi = jnp.clip(jnp.round(x), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0, h - 1).astype(jnp.int32)
    return img[yi, xi]


def compute_crop_params(mask: jax.Array, crop_factor: float = 1.2,
                        crop_size: int = 256, use_full: bool = False) -> jax.Array:
    """crop->raw intrinsics-style transform (fx, fy, px, py) from a mask
    (`geom_utils.py:192-222`). jittable: bbox via masked min/max."""
    h, w = mask.shape
    if use_full:
        mask = jnp.ones_like(mask)
        crop_factor = 1.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    on = mask > 0
    any_on = jnp.any(on)
    big = jnp.float32(1e9)
    x_min = jnp.min(jnp.where(on, xs, big))
    x_max = jnp.max(jnp.where(on, xs, -big))
    y_min = jnp.min(jnp.where(on, ys, big))
    y_max = jnp.max(jnp.where(on, ys, -big))
    # no-mask fallback: full image (geom_utils "no crop if no mask")
    x_min = jnp.where(any_on, x_min, 0.0)
    x_max = jnp.where(any_on, x_max, w - 1.0)
    y_min = jnp.where(any_on, y_min, 0.0)
    y_max = jnp.where(any_on, y_max, h - 1.0)

    cx = jnp.floor((x_max + x_min) / 2.0)
    cy = jnp.floor((y_max + y_min) / 2.0)
    lx = jnp.floor(crop_factor * jnp.floor((x_max - x_min) / 2.0))
    ly = jnp.floor(crop_factor * jnp.floor((y_max - y_min) / 2.0))
    fx = 2.0 * lx / crop_size
    fy = 2.0 * ly / crop_size
    return jnp.stack([fx, fy, cx - lx, cy - ly])


def crop_resample(img: jax.Array, crop2raw: jax.Array, crop_size: int,
                  nearest: bool = False) -> jax.Array:
    """Resample (H, W, C) to the (crop_size, crop_size) crop frame
    (`libs/io.py:137-150` cv2.remap equivalent)."""
    xs = jnp.arange(crop_size, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
    x_raw = gx * crop2raw[0] + crop2raw[2]
    y_raw = gy * crop2raw[1] + crop2raw[3]
    fn = nearest_sample if nearest else bilinear_sample
    return fn(img, x_raw, y_raw)


def warp_by_flow(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp img (H, W, C) by flow (H, W, 2)."""
    h, w = img.shape[:2]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return bilinear_sample(img, gx + flow[..., 0], gy + flow[..., 1])


def flow_to_crop(flow_raw: jax.Array, hp_raw: jax.Array, crop2raw_other: jax.Array,
                 hxy_crop: jax.Array) -> jax.Array:
    """Convert raw-coordinate flow into the crop frame
    (`libs/io.py:204-230` flow_process)."""
    target_raw = flow_raw + hp_raw[..., :2]
    fx, fy, px, py = (crop2raw_other[0], crop2raw_other[1],
                      crop2raw_other[2], crop2raw_other[3])
    target_crop_x = (target_raw[..., 0] - px) / fx
    target_crop_y = (target_raw[..., 1] - py) / fy
    target_crop = jnp.stack([target_crop_x, target_crop_y], axis=-1)
    return target_crop - hxy_crop[..., :2]


def flow_cycle_uncertainty(occ: jax.Array, flow0_crop: jax.Array,
                           flow1_crop_warped_coords: jax.Array,
                           hxy: jax.Array) -> jax.Array:
    """Forward-backward cycle uncertainty (`libs/io.py:188-202`):
    uct = exp(-25 * ||bw(fw(x)) - x|| / size * 2), floored at 0.25 -> 0,
    zeroed where occluded."""
    img_size = occ.shape[0]
    # displace hxy by fw flow, then sample the bw "target coords" there
    cyc = warp_by_flow(flow1_crop_warped_coords, flow0_crop) - hxy[..., :2]
    dis = jnp.sqrt(jnp.maximum(jnp.sum(cyc * cyc, axis=-1), 1e-24))
    uct = jnp.exp(-25.0 * dis / img_size * 2.0)
    uct = jnp.where(uct < 0.25, 0.0, uct)
    return jnp.where(occ > 0, 0.0, uct)
