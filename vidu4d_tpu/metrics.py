"""Quantitative evaluation CLI (mirrors `gs/metrics.py:49-100`): PSNR/SSIM
(and LPIPS when torchvision weights are available locally) over rendered vs
ground-truth image directories.

Usage:
    python -m vidu4d_tpu.metrics --pred_dir renders/ --gt_dir gt/
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
from absl import app, flags

flags.DEFINE_string("pred_dir", "", "directory of rendered images")
flags.DEFINE_string("gt_dir", "", "directory of ground-truth images")

FLAGS = flags.FLAGS


def load_images(d):
    import imageio.v2 as imageio

    paths = sorted(
        glob.glob(os.path.join(d, "*.png")) + glob.glob(os.path.join(d, "*.jpg"))
    )
    return [imageio.imread(p).astype(np.float32) / 255.0 for p in paths]


def compute_metrics(preds, gts):
    import jax.numpy as jnp

    from vidu4d_tpu.ops.image_losses import psnr, ssim
    from vidu4d_tpu.ops.lpips import lpips, lpips_kind

    psnrs, ssims, lpipss = [], [], []
    for p, g in zip(preds, gts):
        p_t = jnp.transpose(jnp.asarray(p[..., :3]), (2, 0, 1))
        g_t = jnp.transpose(jnp.asarray(g[..., :3]), (2, 0, 1))
        psnrs.append(float(psnr(p_t, g_t)))
        ssims.append(float(ssim(p_t, g_t)))
        lpipss.append(lpips(p[..., :3], g[..., :3]))
    # fallback (pinned random VGG) values are self-consistent but NOT
    # comparable to published LPIPS(vgg) — report them under a distinct
    # key so consumers comparing against literature see "lpips": None
    kind = lpips_kind()
    mean_lpips = float(np.mean(lpipss))
    return {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "lpips": mean_lpips if kind == "vgg16-pretrained" else None,
        "lpips_random": None if kind == "vgg16-pretrained" else mean_lpips,
        # which VGG weights produced the LPIPS number (pretrained vs the
        # pinned random fallback — see vidu4d_tpu/ops/lpips.py docstring)
        "lpips_kind": kind,
        "n_images": len(psnrs),
    }


def main(_):
    preds = load_images(FLAGS.pred_dir)
    gts = load_images(FLAGS.gt_dir)
    assert len(preds) == len(gts) and preds, (len(preds), len(gts))
    print(json.dumps(compute_metrics(preds, gts)))


if __name__ == "__main__":
    app.run(main)
