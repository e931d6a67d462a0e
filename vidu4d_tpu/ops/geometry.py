"""Camera / SE(3) / aabb geometry utilities (pure JAX).

Covers the numeric parts of the reference `lab4d/utils/geom_utils.py`
(pinhole projection, K-matrix tuple ops, hat map / SO(3) exp, near-far from
proxy points, aabb helpers, crop<->raw intrinsics composition) with identical
math, written branch-free for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Pinhole / intrinsics
# ---------------------------------------------------------------------------


def pinhole_projection(Kmat: jax.Array, xyz_cam: jax.Array) -> jax.Array:
    """Project camera-space points to homogeneous pixel coordinates.

    Args:
        Kmat: (M, 3, 3) intrinsics.
        xyz_cam: (M, ..., 3) camera-space points.
    Returns:
        (M, ..., 3) homogeneous pixel coords (x, y, 1-ish).
    """
    shape = xyz_cam.shape
    Kmat = Kmat.reshape(shape[:1] + (1,) * (len(shape) - 2) + (3, 3))
    hxy = jnp.einsum("...ij,...j->...i", Kmat, xyz_cam)
    # sign-preserving clamped denominator: a warped point crossing the
    # camera plane (z ~ -1e-6 with the old additive bias) produced inf/NaN
    # gradients that a single global-norm clip then spread to every param
    z = hxy[..., -1:]
    z_safe = jnp.where(jnp.abs(z) < 1e-3, jnp.where(z < 0, -1e-3, 1e-3), z)
    return hxy / z_safe


def K2mat(K: jax.Array) -> jax.Array:
    """(..., 4) intrinsics tuple (fx, fy, cx, cy) -> (..., 3, 3) matrix."""
    fx, fy, cx, cy = jnp.moveaxis(K, -1, 0)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    rows = jnp.stack(
        [fx, zero, cx, zero, fy, cy, zero, zero, one], axis=-1
    )
    return rows.reshape(K.shape[:-1] + (3, 3))


def mat2K(Kmat: jax.Array) -> jax.Array:
    """(..., 3, 3) intrinsics matrix -> (..., 4) tuple (fx, fy, cx, cy)."""
    return jnp.stack(
        [Kmat[..., 0, 0], Kmat[..., 1, 1], Kmat[..., 0, 2], Kmat[..., 1, 2]],
        axis=-1,
    )


def K2inv(K: jax.Array) -> jax.Array:
    """(..., 4) intrinsics tuple -> (..., 3, 3) inverse intrinsics matrix."""
    fx, fy, cx, cy = jnp.moveaxis(K, -1, 0)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    rows = jnp.stack(
        [1.0 / fx, zero, -cx / fx, zero, 1.0 / fy, -cy / fy, zero, zero, one],
        axis=-1,
    )
    return rows.reshape(K.shape[:-1] + (3, 3))


def Kmatinv(Kmat: jax.Array) -> jax.Array:
    return K2inv(mat2K(Kmat))


def compose_crop2raw(K_raw: jax.Array, crop2raw: jax.Array) -> jax.Array:
    """Intrinsics tuple of the cropped image given raw intrinsics and the
    crop->raw transform tuple (fx, fy, px, py) (see `lab4d/utils/camera_utils.py`):

        x_raw = x_crop * fx + px
    """
    fx = K_raw[..., 0] / crop2raw[..., 0]
    fy = K_raw[..., 1] / crop2raw[..., 1]
    cx = (K_raw[..., 2] - crop2raw[..., 2]) / crop2raw[..., 0]
    cy = (K_raw[..., 3] - crop2raw[..., 3]) / crop2raw[..., 1]
    return jnp.stack([fx, fy, cx, cy], axis=-1)


def hxy_grid(H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel-center grid, (H*W, 3) rows of (x, y, 1)."""
    x = jnp.arange(W, dtype=dtype)
    y = jnp.arange(H, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1).reshape(-1, 3)


# ---------------------------------------------------------------------------
# SO(3) / SE(3)
# ---------------------------------------------------------------------------


def hat_map(v: jax.Array) -> jax.Array:
    """(..., 3) vector -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    rows = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return rows.reshape(v.shape[:-1] + (3, 3))


def so3_to_exp_map(so3: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Rodrigues: (..., 3) rotation vector -> (..., 3, 3) rotation matrix."""
    theta = jnp.linalg.norm(so3, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, eps)
    V = hat_map(so3 / theta)
    theta = theta[..., None]
    eye = jnp.eye(3, dtype=so3.dtype)
    return eye + jnp.sin(theta) * V + (1.0 - jnp.cos(theta)) * (V @ V)


def apply_se3(rtmat: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) SE(3) to (..., N, 3) points."""
    rot = rtmat[..., :3, :3]
    trans = rtmat[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, pts) + trans[..., None, :]


def obj_to_cam(pts: jax.Array, rtmat: jax.Array) -> jax.Array:
    """(N, 3) or (M, N, 3) points via (M, 4, 4) object-to-camera transforms."""
    if pts.ndim == 2:
        pts = jnp.broadcast_to(pts[None], (rtmat.shape[0],) + pts.shape)
    return apply_se3(rtmat, pts)


def get_near_far(pts: jax.Array, rtmat: jax.Array, tol_fac: float = 1.5) -> jax.Array:
    """Near/far planes from proxy points under each camera.

    Args:
        pts: (N, 3) proxy points in object space.
        rtmat: (M, 4, 4) object-to-camera transforms.
    Returns:
        (M, 2) near/far, clamped at 1e-3.
    """
    z = obj_to_cam(pts, rtmat)[..., 2]
    pmin = jnp.min(z, axis=-1)
    pmax = jnp.max(z, axis=-1)
    delta = (pmax - pmin) * (tol_fac - 1.0)
    near_far = jnp.stack([pmin - delta, pmax + delta], axis=-1)
    return jnp.maximum(near_far, 1e-3)


# ---------------------------------------------------------------------------
# AABB helpers
# ---------------------------------------------------------------------------


def extend_aabb(aabb: jax.Array, factor: float = 0.1) -> jax.Array:
    size = aabb[1] - aabb[0]
    return jnp.stack([aabb[0] - size * factor, aabb[1] + size * factor], axis=0)


def check_inside_aabb(xyz: jax.Array, aabb: jax.Array) -> jax.Array:
    return jnp.all((xyz > aabb[:1]) & (xyz < aabb[1:]), axis=-1)


def sample_grid(aabb: jax.Array, grid_size: int) -> jax.Array:
    """(grid_size^3, 3) dense grid spanning the aabb (x-major, like cartesian_prod)."""
    axes = [jnp.linspace(aabb[0][i], aabb[1][i], grid_size) for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def points_aabb(pts: jax.Array) -> jax.Array:
    return jnp.stack([jnp.min(pts, axis=0), jnp.max(pts, axis=0)], axis=0)


def rot_angle(mat: jax.Array) -> jax.Array:
    """Rotation angle of (..., 3, 3) rotation matrices."""
    eps = 1e-4
    cos = (mat[..., 0, 0] + mat[..., 1, 1] + mat[..., 2, 2] - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0 + eps, 1.0 - eps))
