"""TSDF fusion (batched JAX; replaces the vendored CPU `fusion.py` used by
`preprocess/scripts/tsdf_fusion.py:42-113`).

Depth maps are integrated into a fixed-resolution voxel grid with a
`lax.scan` over frames — each step projects ALL voxels into the frame
(gather + where), the classic gather-formulation of TSDF that maps well to
TPU (no scatter conflicts). Mesh extraction reuses the marching-tets kernel;
cameras are recentered exactly like the reference (`tsdf_fusion.py:88-113`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.ops.marching import extract_mesh_np
from vidu4d_tpu.preprocess.ops import bilinear_sample


def view_frustum_points(depth: jax.Array, kinv: jax.Array, cam2scene: jax.Array):
    """Scene-space corners of the view frustum (`fusion.py` get_view_frustum)."""
    h, w = depth.shape
    dmax = jnp.maximum(jnp.max(depth), 1e-3)
    corners = jnp.array(
        [[0.0, 0, 1], [w, 0, 1], [w, h, 1], [0, h, 1]], jnp.float32
    )
    pts = []
    for d in (jnp.zeros(()), dmax):
        p = (corners @ kinv.T) * d
        pts.append(p)
    pts = jnp.concatenate(pts, axis=0)
    return pts @ cam2scene[:3, :3].T + cam2scene[:3, 3]


def fuse_tsdf(
    depths: jax.Array,  # (T, H, W) masked depth (0 = invalid)
    colors: jax.Array,  # (T, H, W, 3)
    kinvs: jax.Array,  # (T, 3, 3)
    cam2scene: jax.Array,  # (T, 4, 4)
    vol_bnds: jax.Array,  # (2, 3) scene-space bounds
    grid_size: int = 128,
    trunc_ratio: float = 5.0,
):
    """Integrate all frames. Returns (tsdf (G,G,G), color (G,G,G,3), weight)."""
    voxel_size = jnp.max((vol_bnds[1] - vol_bnds[0]) / grid_size)
    trunc = trunc_ratio * voxel_size

    axes = [jnp.linspace(vol_bnds[0, i], vol_bnds[1, i], grid_size) for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    vox_scene = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (V, 3)

    def integrate(carry, frame):
        tsdf, color, weight = carry
        depth, rgb, kinv, c2s = frame
        s2c = jnp.linalg.inv(c2s)
        vox_cam = vox_scene @ s2c[:3, :3].T + s2c[:3, 3]
        z = vox_cam[:, 2]
        kmat = jnp.linalg.inv(kinv)
        u = kmat[0, 0] * vox_cam[:, 0] / jnp.maximum(z, 1e-6) + kmat[0, 2]
        v = kmat[1, 1] * vox_cam[:, 1] / jnp.maximum(z, 1e-6) + kmat[1, 2]

        h, w = depth.shape
        inside = (z > 0) & (u >= 0) & (u < w - 1) & (v >= 0) & (v < h - 1)
        d_obs = bilinear_sample(depth[..., None], u, v)[:, 0]
        rgb_obs = bilinear_sample(rgb, u, v)
        valid = inside & (d_obs > 0)
        sdf = d_obs - z
        valid = valid & (sdf >= -trunc)
        tsdf_obs = jnp.clip(sdf / trunc, -1.0, 1.0)

        obs_w = valid.astype(jnp.float32)
        new_weight = weight + obs_w
        denom = jnp.maximum(new_weight, 1e-6)
        tsdf = (tsdf * weight + tsdf_obs * obs_w) / denom
        color = (color * weight[:, None] + rgb_obs * obs_w[:, None]) / denom[:, None]
        return (tsdf, color, new_weight), None

    v = vox_scene.shape[0]
    init = (jnp.ones((v,)), jnp.zeros((v, 3)), jnp.zeros((v,)))
    (tsdf, color, weight), _ = jax.lax.scan(
        integrate, init, (depths, colors, kinvs, cam2scene)
    )
    g = grid_size
    return tsdf.reshape(g, g, g), color.reshape(g, g, g, 3), weight.reshape(g, g, g)


def tsdf_to_mesh(tsdf: np.ndarray, weight: np.ndarray, vol_bnds: np.ndarray):
    """Extract the zero-surface; unobserved voxels are pushed outside."""
    sdf = np.where(weight > 0, tsdf, 1.0)
    return extract_mesh_np(sdf, vol_bnds)


def recenter_mesh_and_cams(verts: np.ndarray, cams_scene2cam: np.ndarray):
    """Center the mesh at the origin and shift cameras accordingly
    (`tsdf_fusion.py:88-113`). Returns (verts_centered, cams_centered)."""
    center = 0.5 * (verts.min(0) + verts.max(0))
    verts = verts - center
    cams_out = []
    for s2c in cams_scene2cam:
        c2s = np.linalg.inv(s2c)
        c2s[:3, 3] -= center
        cams_out.append(np.linalg.inv(c2s))
    return verts, np.stack(cams_out)
