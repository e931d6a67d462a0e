"""Stage-level timing of the production Pallas rasterization path.

Splits profile_step's raster_fwd/raster_grad into the pipeline stages that
make it up, using the SAME trainer/scene as bench.py (production loss
config, densify dummies, extra channels):

  sh_proj    SH color eval + per-frame projection (vmap)
  bin        + bin_splats (rect emit + int32 key sort) + entry cap
  pack       + pack_props row gather into the chunk-major slab
  fwd        full forward (= + fwd kernel + assemble)
  bwd_kernel backward pallas_call alone on fixed slab/cot/resid
  grad       full d(render)/d(surfel params, cam inputs) incl. epilogue

Differences are the stage costs. Same anti-hoisting discipline as bench.py.

    PYTHONPATH=.:/root/.axon_site python scripts/profile_raster.py \
        --surfels 200000 --res 256 --iters 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._enable_compile_cache()

from scripts.profile_step import timed, perturb  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--surfels", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vidu4d_tpu.models.gaussian import surfels as sf
    from vidu4d_tpu.models.gaussian.deformable import render_surfels_batch
    from vidu4d_tpu.ops import geometry as geom
    from vidu4d_tpu.ops import sh as sh_ops
    from vidu4d_tpu.ops.rasterize import common
    from vidu4d_tpu.ops.rasterize import pallas_backward as pb
    from vidu4d_tpu.ops.rasterize import pallas_kernel as pk

    tmp = tempfile.mkdtemp(prefix="profr_")
    trainer = bench.build_trainer(
        args.surfels, args.res, args.frames, "pallas_grad", 4, 1024, tmp
    )
    deformer = trainer.deformer
    batch = trainer._next_batch()
    dparams = trainer.params
    sparams = trainer.surfels.params
    alive = trainer.surfels.alive
    cfg = trainer.raster_cfg
    res = args.res
    sh_degree = trainer.opts.get("sh_degree", 3)

    def warp_out(dp, b, sp):
        s = deformer.apply(dp, b, method=deformer.get_samples)
        xyz_cam, rot_cam, _aux = deformer.apply(
            dp, sp.xyz, sf.get_rotation(sp), s, method=deformer.warp_surfels
        )
        return xyz_cam, rot_cam, s

    xyz_cam, rot_cam, samples = jax.jit(warp_out)(dparams, batch, sparams)
    intrins = geom.mat2K(geom.Kmatinv(samples["Kinv"]))
    bg = deformer.apply(dparams, method=deformer.background)
    dummy = jnp.zeros((xyz_cam.shape[0], args.surfels, 2), jnp.float32)
    eye = jnp.eye(4, dtype=xyz_cam.dtype)
    report = {}

    scaling = sf.get_scaling(sparams)
    opacity = sf.get_opacity(sparams)[:, 0]
    shs = sf.get_features(sparams)

    def sh_proj(sp, xc, rc):
        scl = sf.get_scaling(sp)
        shs_ = sf.get_features(sp)
        colors_b = jax.vmap(
            lambda x: sh_ops.eval_sh_color(
                sh_degree, shs_, x, jnp.zeros((3,), x.dtype))
        )(xc)
        proj_b = jax.vmap(
            lambda x, r, k, d: common.project_splats(
                x, r, scl, eye, k, mask=alive, densify_dummy=d)
        )(xc, rc, intrins, dummy)
        return colors_b, proj_b

    # ---- stage A: SH + projection ------------------------------------
    def f_a(c, inp):
        sp, xc, rc = inp
        colors_b, proj_b = sh_proj(perturb(sp, c), xc, rc)
        return (jnp.sum(colors_b) + jnp.sum(proj_b.tu)
                + jnp.sum(proj_b.center2d))

    report["sh_proj_ms"], _ = timed(f_a, (sparams, xyz_cam, rot_cam),
                                    args.iters)
    print(f"sh_proj: {report['sh_proj_ms']:.1f} ms", flush=True)

    # ---- stage B: + binning + cap ------------------------------------
    def f_b(c, inp):
        sp, xc, rc = inp
        colors_b, proj_b = sh_proj(perturb(sp, c), xc, rc)
        binning = common.bin_splats_batch(proj_b, res, res, tile=cfg.tile,
                                          span_cap=cfg.span_cap)
        binning = common.cap_binning(binning, cfg.entry_cap, chunk=pk.CHUNK)
        return (jnp.sum(colors_b) + jnp.sum(binning.tile_count)
                + jnp.sum(binning.sorted_splat_ids[:, 0]))

    report["bin_ms"], _ = timed(f_b, (sparams, xyz_cam, rot_cam), args.iters)
    print(f"bin: {report['bin_ms']:.1f} ms", flush=True)

    # ---- stage C: + pack ---------------------------------------------
    def f_c(c, inp):
        sp, xc, rc = inp
        colors_b, proj_b = sh_proj(perturb(sp, c), xc, rc)
        binning = common.bin_splats_batch(proj_b, res, res, tile=cfg.tile,
                                          span_cap=cfg.span_cap)
        binning = common.cap_binning(binning, cfg.entry_cap, chunk=pk.CHUNK)
        opac_b = jnp.broadcast_to(
            sf.get_opacity(perturb(sp, c))[:, 0][None], colors_b.shape[:2])
        slab_b = jnp.stack([
            pk.pack_props(jax.tree.map(lambda x: x[f], proj_b), colors_b[f],
                          opac_b[f], binning.sorted_splat_ids[f])
            for f in range(args.frames)
        ])
        return jnp.sum(slab_b[:, 0, :, 0])

    report["pack_ms"], _ = timed(f_c, (sparams, xyz_cam, rot_cam), args.iters)
    print(f"pack: {report['pack_ms']:.1f} ms", flush=True)

    # ---- stage D: full forward ---------------------------------------
    def render_scalar(sp, xc, rc):
        out = render_surfels_batch(
            sp, alive, xc, rc, intrins, res, res, sh_degree, bg,
            cfg, densify_dummy=dummy,
        )
        return (jnp.sum(out.color) + jnp.sum(out.alpha) + jnp.sum(out.depth))

    def f_d(c, inp):
        sp, xc, rc = inp
        return render_scalar(perturb(sp, c), xc, rc)

    report["fwd_ms"], _ = timed(f_d, (sparams, xyz_cam, rot_cam), args.iters)
    print(f"fwd: {report['fwd_ms']:.1f} ms", flush=True)

    # ---- stage E: backward kernel alone ------------------------------
    colors_b, proj_b = jax.jit(sh_proj)(sparams, xyz_cam, rot_cam)
    binning = common.bin_splats_batch(proj_b, res, res, tile=cfg.tile,
                                      span_cap=cfg.span_cap)
    binning = common.cap_binning(binning, cfg.entry_cap, chunk=pk.CHUNK)
    opac_b = jnp.broadcast_to(opacity[None], colors_b.shape[:2])
    slab_b = jnp.stack([
        pk.pack_props(jax.tree.map(lambda x: x[f], proj_b), colors_b[f],
                      opac_b[f], binning.sorted_splat_ids[f])
        for f in range(args.frames)
    ])
    e_pad = slab_b.shape[1] * slab_b.shape[3]
    slab = slab_b.reshape((-1,) + slab_b.shape[2:])
    m = args.frames
    offs = (jnp.arange(m, dtype=jnp.int32) * e_pad)[:, None]
    tile_start = (binning.tile_start + offs).reshape(-1)
    tile_count = binning.tile_count.reshape(-1)
    tiles_y, tiles_x = common.tile_grid_shape(res, res, cfg.tile)
    tile_ids = jnp.arange(tile_start.shape[0], dtype=jnp.int32)
    bg3 = jnp.zeros((3,), jnp.float32)
    color, aux = pk.forward_tiles_pallas(
        slab, tile_start, tile_count, bg3, tiles_x, tiles_y, cfg.tile,
        n_frames=m, tile_ids=tile_ids)
    resid = aux[..., 8:12]
    px_n = cfg.tile * cfg.tile
    cot = jnp.full((tile_start.shape[0], px_n, 10), 0.1, jnp.float32)

    def f_e(c, inp):
        (slab_,) = inp
        g = pb.backward_pallas(
            perturb(slab_, c), tile_start, tile_count, cot, resid,
            res, res, tile=cfg.tile, n_frames=m, tile_ids=tile_ids)
        return jnp.sum(g[0, :, 0]) + jnp.sum(g[-1, :, 0])

    report["bwd_kernel_ms"], _ = timed(f_e, (slab,), args.iters)
    print(f"bwd_kernel: {report['bwd_kernel_ms']:.1f} ms", flush=True)

    # ---- stage E2: align_binning alone (the r4 scan/sort re-layout) ----
    binning_nocap = common.bin_splats_batch(proj_b, res, res, tile=cfg.tile,
                                            span_cap=cfg.span_cap)
    binning_cap = common.cap_binning(binning_nocap, cfg.entry_cap,
                                     chunk=pk.CHUNK)

    def f_e2(c, inp):
        (b,) = inp
        # anti-hoisting for int inputs: a traced 0/1 scalar add (c*0 would
        # constant-fold and let XLA hoist the body out of the scan)
        b = b._replace(
            sorted_splat_ids=(b.sorted_splat_ids
                              + (c > 1e30).astype(jnp.int32)))
        ab = common.align_binning(b, chunk=pk.CHUNK)
        return (jnp.sum(ab.tile_start) + jnp.sum(ab.sorted_splat_ids[:, 0])
                ).astype(jnp.float32)

    report["align_ms"], _ = timed(f_e2, (binning_cap,), args.iters)
    print(f"align: {report['align_ms']:.1f} ms", flush=True)

    # ---- stage E3: pack transpose alone (row gather + its scatter-add
    # backward — the XLA epilogue that reduces entry grads to splat grads)
    ids_fixed = binning_cap.sorted_splat_ids

    def f_e3(c, inp):
        (sp,) = inp

        def scalar(sp2):
            colors_b2, proj_b2 = sh_proj(sp2, xyz_cam, rot_cam)
            opac_b2 = jnp.broadcast_to(
                sf.get_opacity(sp2)[:, 0][None], colors_b2.shape[:2])
            s = 0.0
            for f in range(args.frames):
                slab_f = pk.pack_props(
                    jax.tree.map(lambda x: x[f], proj_b2), colors_b2[f],
                    opac_b2[f], ids_fixed[f])
                s = s + jnp.sum(slab_f * 1e-6)
            return s

        g = jax.grad(scalar)(perturb(sp, c))
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    report["pack_transpose_ms"], _ = timed(f_e3, (sparams,), args.iters)
    print(f"pack_transpose: {report['pack_transpose_ms']:.1f} ms", flush=True)

    # ---- stage E4: sh_proj fwd+grad (projection/SH backward share) ----
    def f_e4(c, inp):
        (sp,) = inp

        def scalar(sp2):
            colors_b2, proj_b2 = sh_proj(sp2, xyz_cam, rot_cam)
            return (jnp.sum(colors_b2) + jnp.sum(proj_b2.tu)
                    + jnp.sum(proj_b2.tv) + jnp.sum(proj_b2.tw)
                    + jnp.sum(proj_b2.center2d) + jnp.sum(proj_b2.normal))

        g = jax.grad(scalar)(perturb(sp, c))
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    report["sh_proj_grad_ms"], _ = timed(f_e4, (sparams,), args.iters)
    print(f"sh_proj_grad: {report['sh_proj_grad_ms']:.1f} ms", flush=True)

    # ---- stage F: full grad ------------------------------------------
    def f_f(c, inp):
        sp, xc, rc = inp
        g = jax.grad(render_scalar, argnums=(0, 1, 2))(perturb(sp, c), xc, rc)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    report["grad_ms"], _ = timed(f_f, (sparams, xyz_cam, rot_cam), args.iters)
    print(f"grad: {report['grad_ms']:.1f} ms", flush=True)

    report["fwd_kernel_assemble_ms"] = round(
        report["fwd_ms"] - report["pack_ms"], 2)
    report["epilogue_ms"] = round(
        report["grad_ms"] - report["fwd_ms"] - report["bwd_kernel_ms"], 2)
    # pack_transpose includes one sh_proj fwd+bwd to build the graph;
    # sh_proj fwd is report["sh_proj_ms"] — the scatter-add share is
    # roughly pack_transpose - 2*sh_proj
    report["pack_scatter_est_ms"] = round(
        report["pack_transpose_ms"] - 2 * report["sh_proj_ms"], 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
