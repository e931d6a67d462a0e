"""Static-scene 2DGS CLI (the `gs/train.py` + `gs/render.py` equivalent).

Train a static Gaussian-surfel scene from a COLMAP or Blender dataset:

    python -m vidu4d_tpu.gs_static --source_path <scene> --model_path out/ \
        --iterations 30000

Renders the held-out cameras and extracts the TSDF mesh at the end.
"""

from __future__ import annotations

import json
import os

import numpy as np
from absl import app, flags

from vidu4d_tpu.config import define_flag_once, get_config

define_flag_once("string", "source_path_", "", "scene directory")
define_flag_once("string", "model_path_", "out_gs", "output directory")
define_flag_once("boolean", "extract_mesh", True, "TSDF mesh at the end")
define_flag_once("integer", "downscale", 1, "image downscale factor")
define_flag_once("string", "gui_ip", "", "live-viewer host (empty disables)")
define_flag_once("integer", "gui_port", 6323, "live-viewer port")


def load_camera(scene_cam, downscale=1):
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from vidu4d_tpu.engine.gs_trainer import Camera

    img = imageio.imread(scene_cam.image_path).astype(np.float32) / 255.0
    if img.shape[-1] == 4:
        img = img[..., :3] * img[..., 3:] + (1 - img[..., 3:])
    if downscale > 1:
        img = img[::downscale, ::downscale]
    intr = scene_cam.intrins / downscale
    return Camera(
        viewmat=jnp.asarray(scene_cam.viewmat),
        intrins=jnp.asarray(intr),
        image=jnp.asarray(img),
    )


def main(_):
    import jax
    import jax.numpy as jnp

    from vidu4d_tpu.data.scene_readers import read_scene
    from vidu4d_tpu.engine.gs_trainer import GsTrainConfig, train
    from vidu4d_tpu.models.gaussian import surfels as sf
    from vidu4d_tpu.models.gaussian.extract import extract_mesh
    from vidu4d_tpu.models.gaussian.ply_io import save_ply
    from vidu4d_tpu.ops.image_losses import psnr

    opts = get_config()
    scene = read_scene(opts["source_path_"])
    cams = [load_camera(c, opts["downscale"]) for c in scene.train_cameras]
    out_dir = opts["model_path_"]
    os.makedirs(out_dir, exist_ok=True)

    capacity = opts.get("gs_capacity", 400_000)
    state = sf.init_from_points(
        jnp.asarray(scene.points), jnp.asarray(scene.colors), capacity,
        sh_degree=opts["sh_degree"],
    )
    config = GsTrainConfig(
        iterations=opts["iterations"],
        lambda_dssim=opts.get("lambda_dssim", 0.2) or 0.2,
        sh_degree=opts["sh_degree"],
        densification_interval=opts["densification_interval"],
        opacity_reset_interval=opts["opacity_reset_interval"],
        densify_from_iter=opts["densify_from_iter"],
        densify_until_iter=opts["densify_until_iter"],
        densify_grad_threshold=opts["densify_grad_threshold"],
        percent_dense=opts["percent_dense"],
        white_background=opts["white_background"],
    )
    viewer = None
    if opts.get("gui_ip"):
        from vidu4d_tpu.utils.network_gui import ViewerServer

        viewer = ViewerServer(opts["gui_ip"], opts["gui_port"],
                              source_path=opts["source_path_"])
    try:
        state, adam, history = train(
            state, cams, config, scene_extent=scene.extent, log_every=100,
            viewer=viewer,
        )
    finally:
        if viewer is not None:
            viewer.close()
    save_ply(os.path.join(out_dir, "point_cloud.ply"),
             jax.tree.map(np.asarray, state.params), np.asarray(state.alive))

    # final eval over train views: PSNR/SSIM/LPIPS (`gs/metrics.py:49-100`)
    from vidu4d_tpu.ops.image_losses import ssim
    from vidu4d_tpu.ops.lpips import lpips, lpips_kind
    from vidu4d_tpu.ops.rasterize import rasterize

    bg = jnp.ones((3,)) if config.white_background else jnp.zeros((3,))

    import functools

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def render_cam(params, alive, viewmat, intrins, h, w):
        return rasterize(
            params.xyz, sf.get_rotation(params), sf.get_scaling(params),
            sf.get_opacity(params)[:, 0], viewmat=viewmat, intrins=intrins,
            height=h, width=w, shs=sf.get_features(params),
            sh_degree=config.sh_degree, bg_color=bg, mask=alive,
            config=config.raster,
        )

    final = {"psnr": [], "ssim": [], "lpips": []}
    for cam in cams[:: max(1, len(cams) // 8)]:
        h, w = cam.image.shape[:2]
        out = render_cam(
            state.params, state.alive, cam.viewmat, cam.intrins, h, w
        )
        pred = np.clip(np.asarray(out.color), 0, 1)
        gt = np.asarray(cam.image)
        p_t = jnp.transpose(jnp.asarray(pred), (2, 0, 1))
        g_t = jnp.transpose(jnp.asarray(gt), (2, 0, 1))
        final["psnr"].append(float(psnr(p_t, g_t)))
        final["ssim"].append(float(ssim(p_t, g_t)))
        final["lpips"].append(lpips(pred, gt))
    if history:
        history[-1].update(
            eval_psnr=float(np.mean(final["psnr"])),
            eval_ssim=float(np.mean(final["ssim"])),
            eval_lpips=float(np.mean(final["lpips"])),
            lpips_kind=lpips_kind(),
        )
    with open(os.path.join(out_dir, "history.json"), "w") as f:
        json.dump(history, f)

    if opts["extract_mesh"] and scene.train_cameras:
        h = scene.train_cameras[0].height // opts["downscale"]
        w = scene.train_cameras[0].width // opts["downscale"]
        extract_mesh(
            state.params, state.alive, scene.train_cameras[::4], h, w,
            out_path=os.path.join(out_dir, "fused_mesh.obj"),
        )
    print(f"done; artifacts in {out_dir}")


if __name__ == "__main__":
    app.run(main)
