"""Spherical-harmonics color evaluation (degree 0..3).

Same basis/coefficients as the reference (`gs/utils/sh_utils.py`,
`cuda_rasterizer/auxiliary.h` SH_C*); evaluated as one fused polynomial on the
VPU.  Storage layout matches 3DGS: ``sh[..., K, 3]`` with ``K = (deg+1)**2``
coefficients per channel (features_dc is coefficient 0, features_rest 1..K-1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    return sh * C0 + 0.5


def num_sh_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def eval_sh(deg: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH at unit directions.

    Args:
        deg: SH degree in [0, 3] (static).
        sh: (..., K, C) coefficients with K >= (deg+1)**2.
        dirs: (..., 3) unit directions.
    Returns:
        (..., C) values (NOT clamped / shifted — see :func:`eval_sh_color`).
    """
    if not 0 <= deg <= 3:
        raise ValueError(f"unsupported SH degree {deg}")
    result = C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :]
                )
    return result


def eval_sh_color(deg: int, sh: jax.Array, means: jax.Array, cam_pos: jax.Array) -> jax.Array:
    """SH -> RGB as the rasterizer preprocess does (`forward.cu` computeColorFromSH):

    view direction from camera center to splat, +0.5 shift, clamp at 0.
    The clamp's zero-gradient-on-negative behavior matches the reference's
    `clamped` bookkeeping in the backward pass (autodiff gives it for free).
    """
    dirs = means - cam_pos
    dirs = dirs / jnp.sqrt(jnp.maximum(jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-24))
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)
