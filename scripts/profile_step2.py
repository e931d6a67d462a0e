"""Breakdown of profile_step's "unaccounted" 37 ms (round-5 perf hunt).

profile_step.py accounts warp_grad + raster_grad; the rest of the
production step is the loss-stack extras and the update tail. Stages here
(same anti-hoisting discipline):

  cycle_grad   backward warp of xyz_cam + cycle loss, fwd+grad
  flow_grad    cycle + flow_surfels projection chain, fwd+grad
  feat_grad    global_match (softmax matmul vs 2048 candidates) +
               forward_project + reproj loss, fwd+grad
  view_stats   densify-stat projection pass (vmap project+rects)
  gs_adam      surfel Adam update alone
  warp_adamw   deformer AdamW update alone

    PYTHONPATH=.:/root/.axon_site python scripts/profile_step2.py
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
    from vidu4d_tpu.models.gaussian.optimizer import gs_adam_update
    from vidu4d_tpu.ops import geometry as geom
    from vidu4d_tpu.ops.numerics import safe_norm
    from vidu4d_tpu.ops.rasterize.common import (
        compute_tile_rects,
        project_splats,
    )

    tmp = tempfile.mkdtemp(prefix="prof2_")
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
    report = {}

    def warp_out(dp, sp):
        s = deformer.apply(dp, batch, method=deformer.get_samples)
        xyz_cam, rot_cam, _ = deformer.apply(
            dp, sp.xyz, sf.get_rotation(sp), s, method=deformer.warp_surfels
        )
        return xyz_cam, rot_cam, s

    xyz_cam, rot_cam, samples = jax.jit(
        lambda dp, sp: warp_out(dp, sp)
    )(dparams, sparams)
    intrins = geom.mat2K(geom.Kmatinv(samples["Kinv"]))
    eye = jnp.eye(4)

    # ---- cycle loss fwd+grad ------------------------------------------
    def cycle_scalar(dp, xc, xyz):
        s = deformer.apply(dp, batch, method=deformer.get_samples)
        cyc = deformer.apply(dp, xc, xyz, s, method=deformer.cycle_loss)
        return sum(jnp.sum(v) for v in jax.tree.leaves(cyc))

    def f_cyc(c, inp):
        dp, xc = inp
        g = jax.grad(cycle_scalar, argnums=(0, 1))(
            perturb(dp, c), xc, sparams.xyz
        )
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    report["cycle_grad_ms"], _ = timed(f_cyc, (dparams, xyz_cam), args.iters)
    print(f"cycle_grad: {report['cycle_grad_ms']:.1f} ms", flush=True)

    # ---- cycle + flow chain fwd+grad ----------------------------------
    def flow_scalar(dp, xc, xyz):
        s = deformer.apply(dp, batch, method=deformer.get_samples)
        cyc = deformer.apply(dp, xc, xyz, s, method=deformer.cycle_loss)
        flow_pw = deformer.apply(
            dp, xc, s, cyc["xyz_cycled"], method=deformer.flow_surfels
        )
        return (jnp.sum(flow_pw) +
                sum(jnp.sum(v) for v in jax.tree.leaves(cyc)))

    def f_flow(c, inp):
        dp, xc = inp
        g = jax.grad(flow_scalar, argnums=(0, 1))(
            perturb(dp, c), xc, sparams.xyz
        )
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    report["cycle_flow_grad_ms"], _ = timed(
        f_flow, (dparams, xyz_cam), args.iters
    )
    print(f"cycle_flow_grad: {report['cycle_flow_grad_ms']:.1f} ms",
          flush=True)

    # ---- feature reprojection fwd+grad --------------------------------
    n_px = 8192
    st = (res * res) // n_px

    def feat_scalar(dp, sp):
        s = deformer.apply(dp, batch, method=deformer.get_samples)
        feat_px = s["feature"][:, ::st][:, :n_px]
        hxy_px = batch["hxy"][..., :2][:, ::st][:, :n_px]
        matches = deformer.apply(
            dp, feat_px, sp.regist_feat, sp.xyz,
            method=deformer.global_match,
        )
        xy, _ = deformer.apply(
            dp, matches, s, method=deformer.forward_project
        )
        return jnp.sum(safe_norm(xy - hxy_px, axis=-1))

    def f_feat(c, inp):
        dp, sp = inp
        g = jax.grad(feat_scalar, argnums=(0, 1))(perturb(dp, c), sp)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    report["feat_grad_ms"], _ = timed(f_feat, (dparams, sparams), args.iters)
    print(f"feat_grad: {report['feat_grad_ms']:.1f} ms", flush=True)

    # ---- view_stats (densify-stat projection pass) --------------------
    scaling = sf.get_scaling(sparams)
    dummy_g = jnp.zeros((args.frames, args.surfels, 2), jnp.float32)

    def stats_scalar(xc, rc, dg):
        def one(xc_f, rc_f, intr_f, dg_f):
            proj = project_splats(xc_f, rc_f, scaling, eye, intr_f,
                                  mask=alive)
            rects = compute_tile_rects(proj, res, res, cfg.tile,
                                       cfg.span_cap)
            vs = dg_f * proj.depth[:, None] * jnp.array(
                [[res, res]], jnp.float32)
            entries = jnp.sum(
                jnp.where(rects.valid, rects.span_x * rects.span_y, 0))
            return (jnp.sum(safe_norm(vs, axis=-1))
                    + jnp.sum(rects.valid) + entries
                    + jnp.sum(proj.radius))

        return jnp.sum(jax.vmap(one)(xc, rc, intrins, dg))

    def f_stats(c, inp):
        xc, rc = inp
        return stats_scalar(perturb(xc, c), rc, dummy_g)

    report["view_stats_ms"], _ = timed(
        f_stats, (xyz_cam, rot_cam), args.iters
    )
    print(f"view_stats: {report['view_stats_ms']:.1f} ms", flush=True)

    # ---- surfel Adam alone --------------------------------------------
    fake_grads = jax.tree.map(lambda x: x * 1e-3, sparams)

    def f_adam(c, inp):
        sp, ga = inp
        new_p, ga2 = gs_adam_update(
            perturb(fake_grads, c), ga, sp, trainer.gs_lrs
        )
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(new_p))

    report["gs_adam_ms"], _ = timed(
        f_adam, (sparams, trainer.gs_adam), args.iters
    )
    print(f"gs_adam: {report['gs_adam_ms']:.1f} ms", flush=True)

    # ---- warp AdamW alone ---------------------------------------------
    fake_dg = jax.tree.map(lambda x: x * 1e-3, dparams)

    def f_adamw(c, inp):
        dp, st_ = inp
        import optax

        upd, st2 = trainer.warp_opt.update(perturb(fake_dg, c), st_, dp)
        dp2 = optax.apply_updates(dp, upd)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(dp2))

    report["warp_adamw_ms"], _ = timed(
        f_adamw, (dparams, trainer.warp_opt_state), args.iters
    )
    print(f"warp_adamw: {report['warp_adamw_ms']:.1f} ms", flush=True)

    report = {k: round(v, 1) for k, v in report.items()}
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
