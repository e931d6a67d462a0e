"""Per-pixel splat response + front-to-back alpha compositing (pure JAX).

This is the numerical core of the 2DGS renderCUDA loop (`forward.cu:265-463`)
re-expressed as vectorized prefix ops so that XLA autodiff reproduces the
hand-written CUDA backward (`backward.cu:144-449`) exactly:

* transmittance = exclusive cumulative product of (1 - alpha),
* the T < 1e-4 early-out becomes a monotone include mask,
* the streaming distortion-loss accumulators (dist1/dist2/A) become
  exclusive cumulative sums,
* the "last splat with T > 0.5" median becomes a reverse argmax.

Both the naive oracle and the tiled implementations call these functions, so
they agree bit-for-bit given the same splat ordering.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.rasterize.common import (
    ALPHA_CLAMP,
    ALPHA_EPS,
    FAR_PLANE,
    FILTER_INV_SQUARE,
    NEAR_PLANE,
    T_EARLY_STOP,
)


def splat_pixel_response(
    tu: jax.Array,
    tv: jax.Array,
    tw: jax.Array,
    center2d: jax.Array,
    opacity: jax.Array,
    pix: jax.Array,
):
    """Evaluate splat alpha and intersection depth at pixel centers.

    Shapes broadcast: splat tensors are (..., K, 1, c) against pixel (..., 1, N, 2)
    (or any mutually broadcastable arrangement with trailing feature dims).

    Returns:
        alpha: effective alpha (0 where the reference `continue`s).
        depth: per-pixel ray-splat intersection depth.
    """
    px = pix[..., 0:1]
    py = pix[..., 1:2]
    # two homogeneous planes and their intersection line (forward.cu:359-372)
    k = px * tw - tu
    l = py * tw - tv
    p = jnp.cross(k, l)
    pz = p[..., 2]
    pz_ok = pz != 0.0
    pz_safe = jnp.where(pz_ok, pz, 1.0)
    # clip the splat-space intersection: near-degenerate conics send sx/sy
    # to inf, and although such entries composite with zero weight, the
    # inf*0 products in the autodiff VJPs are NaN. Contributing splats have
    # rho3d <= 2·ln(255) (the alpha cull), i.e. |s| < 4 — the clamp is
    # value-preserving for everything visible and zeroes gradients beyond.
    sx = jnp.clip(p[..., 0] / pz_safe, -1e6, 1e6)
    sy = jnp.clip(p[..., 1] / pz_safe, -1e6, 1e6)
    rho3d = sx * sx + sy * sy
    # screen-space low-pass filter (forward.cu:374-382)
    dx = center2d[..., 0] - px[..., 0]
    dy = center2d[..., 1] - py[..., 0]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)

    # splat-space intersection depth vs center depth (forward.cu:385)
    depth = jnp.where(
        rho3d <= rho2d, sx * tw[..., 0] + sy * tw[..., 1] + tw[..., 2], tw[..., 2]
    )
    alpha = jnp.minimum(ALPHA_CLAMP, opacity * jnp.exp(-0.5 * rho))
    ok = pz_ok & (depth >= NEAR_PLANE) & (alpha >= ALPHA_EPS)
    # zero-weight entries must not leak non-finite depths into w*depth sums
    return jnp.where(ok, alpha, 0.0), jnp.where(ok, depth, 0.0)


class CompositeOutput(NamedTuple):
    color: jax.Array  # (N, C) composited color incl. background
    depth: jax.Array  # (N,) expected depth
    alpha: jax.Array  # (N,) accumulated opacity (1 - final T)
    normal: jax.Array  # (N, 3)
    median_depth: jax.Array  # (N,)
    distortion: jax.Array  # (N,)
    median_weight: jax.Array  # (N,)
    final_t: jax.Array  # (N,) final transmittance


def composite(
    alpha: jax.Array,  # (K, N) effective alphas in front-to-back order
    depth: jax.Array,  # (K, N)
    color: jax.Array,  # (K, N, C) or (K, 1, C)
    normal: jax.Array,  # (K, N, 3) or (K, 1, 3)
    bg_color: jax.Array,  # (C,)
) -> CompositeOutput:
    one_minus = 1.0 - alpha
    t_incl = jnp.cumprod(one_minus, axis=0)  # T after compositing splat i
    t_prefix = jnp.concatenate(
        [jnp.ones_like(t_incl[:1]), t_incl[:-1]], axis=0
    )  # T before splat i
    # early-out: splat i composited iff T·(1-alpha_i) >= 1e-4 (forward.cu:401-406).
    # t_incl is non-increasing so the done flag is a simple threshold.
    include = t_incl >= T_EARLY_STOP
    w = alpha * t_prefix * jnp.where(include, 1.0, 0.0)  # (K, N)

    final_t = jnp.min(jnp.where(include, t_incl, 1.0), axis=0)
    color_out = jnp.einsum("kn,knc->nc", w, jnp.broadcast_to(color, w.shape + color.shape[-1:]))
    color_out = color_out + final_t[:, None] * bg_color[None, :]
    normal_out = jnp.einsum("kn,knc->nc", w, jnp.broadcast_to(normal, w.shape + (3,)))
    depth_out = jnp.sum(w * depth, axis=0)

    # streaming distortion loss (forward.cu:410-436): contract depth to [0,1]
    depth_pos = jnp.maximum(depth, 1e-6)
    m = (FAR_PLANE * depth_pos - FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * depth_pos)
    wm = w * m
    wmm = w * m * m
    dist1 = jnp.cumsum(wm, axis=0) - wm  # exclusive
    dist2 = jnp.cumsum(wmm, axis=0) - wmm
    acc_a = 1.0 - t_prefix
    error = m * m * acc_a + dist2 - 2.0 * m * dist1
    distortion = jnp.sum(w * error, axis=0)

    # median depth: last composited splat with T (before) > 0.5
    cand = (w > 0) & (t_prefix > 0.5)
    rev = cand[::-1]
    idx_from_end = jnp.argmax(rev, axis=0)
    has = jnp.any(cand, axis=0)
    idx = alpha.shape[0] - 1 - idx_from_end
    med_depth = jnp.take_along_axis(depth, idx[None], axis=0)[0]
    med_w = jnp.take_along_axis(w, idx[None], axis=0)[0]
    median_depth = jnp.where(has, med_depth, 0.0)
    median_weight = jnp.where(has, med_w, 0.0)

    return CompositeOutput(
        color=color_out,
        depth=depth_out,
        alpha=1.0 - final_t,
        normal=normal_out,
        median_depth=median_depth,
        distortion=distortion,
        median_weight=median_weight,
        final_t=final_t,
    )
