"""Mesh extraction from trained surfels (replaces `gs/utils/mesh_utils.py`
GaussianExtractor): render depth/alpha over the training cameras, fuse the
masked depth maps into a TSDF (our scan-based fusion), extract with marching
tetrahedra, export obj."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.models.gaussian import surfels as sf
from vidu4d_tpu.ops.marching import extract_mesh_np, save_obj
from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize
from vidu4d_tpu.preprocess.tsdf import fuse_tsdf, recenter_mesh_and_cams, tsdf_to_mesh


def render_depth_maps(params: sf.SurfelParams, alive, cameras,
                      height: int, width: int,
                      config: RasterizeConfig = RasterizeConfig(),
                      sh_degree: int = 3):
    """Per-camera (depth, alpha) maps from the surfel model."""
    depths, alphas = [], []
    for cam in cameras:
        out = rasterize(
            params.xyz, sf.get_rotation(params), sf.get_scaling(params),
            sf.get_opacity(params)[:, 0],
            jnp.asarray(cam.viewmat), jnp.asarray(cam.intrins),
            height, width,
            shs=sf.get_features(params), sh_degree=sh_degree,
            mask=alive, config=config,
        )
        depth = out.depth / jnp.maximum(out.alpha, 1e-6)
        depths.append(np.asarray(depth))
        alphas.append(np.asarray(out.alpha))
    return np.stack(depths), np.stack(alphas)


def extract_mesh(params: sf.SurfelParams, alive, cameras, height, width,
                 grid_size: int = 128, alpha_thresh: float = 0.5,
                 depth_trunc: float = 10.0,
                 config: RasterizeConfig = RasterizeConfig(),
                 sh_degree: int = 3, out_path: Optional[str] = None):
    """TSDF-fused mesh over the camera set (`mesh_utils.py:64-270`)."""
    depths, alphas = render_depth_maps(
        params, alive, cameras, height, width, config=config,
        sh_degree=sh_degree,
    )
    depths = np.where((alphas > alpha_thresh) & (depths < depth_trunc), depths, 0.0)
    kinvs = np.stack([
        np.linalg.inv(np.array([
            [c.intrins[0], 0, c.intrins[2]],
            [0, c.intrins[1], c.intrins[3]],
            [0, 0, 1],
        ], np.float32)) for c in cameras
    ])
    cam2scene = np.stack([np.linalg.inv(c.viewmat) for c in cameras])

    # volume bounds from unprojected valid depths
    centers = cam2scene[:, :3, 3]
    radius = max(np.abs(depths).max(), 1e-3)
    lo = centers.min(0) - radius
    hi = centers.max(0) + radius
    vol_bnds = np.stack([lo, hi]).astype(np.float32)

    colors = np.zeros(depths.shape + (3,), np.float32)
    tsdf, _, weight = fuse_tsdf(
        jnp.asarray(depths), jnp.asarray(colors), jnp.asarray(kinvs),
        jnp.asarray(cam2scene), jnp.asarray(vol_bnds), grid_size=grid_size,
    )
    verts, faces = tsdf_to_mesh(np.asarray(tsdf), np.asarray(weight), vol_bnds)
    if out_path and len(verts):
        save_obj(out_path, verts, faces)
    return verts, faces
