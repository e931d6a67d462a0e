"""Coverage validation (SURVEY §7 hard-part 3, VERDICT r1 item 6).

Two checks that the fixed-capacity binning design doesn't silently change
results at production sizes:

1. budget sweep: render a converged-scene workload with the XLA-tiles
   backend at several per-tile budgets and report PSNR of each against the
   Pallas backend (which composites every entry — the unbounded reference
   semantics). Shows where budget truncation starts to bite.
2. 512-res render: the README novel-view recipe renders at 512^2; run one
   512^2 rasterization and report span-cap overflow + per-tile counts so
   big-splat cropping is visible instead of silent.

    PYTHONPATH=.:/root/.axon_site python scripts/validate_coverage.py
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_raster import make_scene
from vidu4d_tpu.ops.image_losses import psnr
from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize
from vidu4d_tpu.ops.rasterize.common import bin_splats, project_splats


def render(scene, res, cfg):
    xyz, quats, scales, opac, colors, viewmat, intrins = scene

    @jax.jit
    def f():
        return rasterize(
            xyz, quats, scales, opac, viewmat=viewmat, intrins=intrins,
            height=res, width=res, colors=colors,
            bg_color=jnp.zeros(3), config=cfg,
        ).color

    return np.asarray(f())


def main():
    out = {}
    res = 256
    scene = make_scene(200_000, res)
    print("scene ready", flush=True)

    # unbounded reference via the plain fwd kernel (the custom_vjp wrapper
    # adds nothing for a no-grad render and has wedged the remote worker
    # twice at this size)
    ref = render(scene, res, RasterizeConfig(impl="pallas"))
    print("reference ready", flush=True)
    sweep = {}
    for budget in (256, 512, 1024, 2048, 4096):
        img = render(
            scene, res,
            RasterizeConfig(impl="tiles", budget=budget, tile_chunk=8),
        )
        p = float(psnr(jnp.asarray(img).transpose(2, 0, 1),
                       jnp.asarray(ref).transpose(2, 0, 1)))
        sweep[budget] = round(p, 2)
        print(f"budget {budget}: PSNR vs unbounded = {p:.2f} dB", flush=True)
    out["budget_psnr_vs_unbounded"] = sweep

    # 512-res coverage telemetry (README render recipe resolution)
    res2 = 512
    scene2 = make_scene(200_000, res2)
    xyz, quats, scales, opac, colors, viewmat, intrins = scene2
    proj = project_splats(xyz, quats, scales, viewmat, intrins)
    binning = bin_splats(proj, res2, res2, tile=16, span_cap=4)
    out["render512"] = {
        "overflowed_splats": int(binning.overflowed),
        "num_entries": int(binning.num_entries),
        "max_tile_count": int(jnp.max(binning.tile_count)),
        "mean_tile_count": round(float(jnp.mean(binning.tile_count)), 1),
    }
    print("render512 binning ready", flush=True)
    img512 = render(scene2, res2, RasterizeConfig(impl="pallas"))
    out["render512"]["finite"] = bool(np.isfinite(img512).all())
    out["render512"]["mean_intensity"] = round(float(img512.mean()), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
