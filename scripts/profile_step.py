"""Component-level timing of the production Stage-3 step on real hardware.

Answers "where do the 709 ms go" by scan-timing each piece of the train
step separately with the same anti-hoisting trick bench.py uses (a carry
perturbation threaded through one input so XLA cannot move the body out of
the loop; the only honored sync on axon is a host fetch).

    PYTHONPATH=. python scripts/profile_step.py --surfels 200000 --iters 8

Components:
  samples     get_samples (camera/intrinsics MLP eval + batch prep)
  warp_fwd    samples + DQ-skinning warp of P surfels (fwd only)
  warp_grad   d(sum warp)/d(deformer params + surfel xyz/rot)
  raster_fwd  batched rasterization fwd at the warped positions
  raster_grad d(sum render)/d(surfel params + cam-space inputs)
  full        the production train step (bench.py's number)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._enable_compile_cache()


def timed(make_scalar_fn, inputs, iters):
    """Scan-time fn(c, inputs)->scalar; returns (ms_per_iter, last_value)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(inputs):
        def body(c, _):
            s = make_scalar_fn(c, inputs)
            return s * 1e-30, s

        _, ss = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return ss[-1]

    v = float(run(inputs))  # compile + warm
    v = float(run(inputs))  # second warm (state canonicalization)
    t0 = time.perf_counter()
    v = float(run(inputs))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1000, v


def perturb(tree, c):
    import jax
    import jax.numpy as jnp

    def f(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x + c.astype(x.dtype) * 1e-30
        return x

    return jax.tree.map(f, tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--surfels", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--impl", default="pallas_grad")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from vidu4d_tpu.engine.schedules import progress_schedule
    from vidu4d_tpu.models.gaussian import surfels as sf
    from vidu4d_tpu.models.gaussian.deformable import render_surfels_batch
    from vidu4d_tpu.ops import geometry as geom

    tmp = tempfile.mkdtemp(prefix="prof_")
    trainer = bench.build_trainer(
        args.surfels, args.res, args.frames, args.impl, 4, 1024, tmp
    )
    deformer = trainer.deformer
    batch = trainer._next_batch()
    dparams = trainer.params
    sparams = trainer.surfels.params
    alive = trainer.surfels.alive
    raster_cfg = trainer.raster_cfg
    res = args.res
    sh_degree = trainer.opts.get("sh_degree", 3)
    report = {}

    # ---- samples ------------------------------------------------------
    def f_samples(c, inp):
        dp, b = inp
        s = deformer.apply(perturb(dp, c), b, method=deformer.get_samples)
        return sum(jnp.sum(x) for x in jax.tree.leaves(s)
                   if jnp.issubdtype(x.dtype, jnp.floating))

    report["samples_ms"], _ = timed(f_samples, (dparams, batch), args.iters)
    print(f"samples: {report['samples_ms']:.1f} ms", flush=True)

    # ---- warp fwd -----------------------------------------------------
    def warp_out(dp, b, sp):
        s = deformer.apply(dp, b, method=deformer.get_samples)
        xyz_cam, rot_cam, _aux = deformer.apply(
            dp, sp.xyz, sf.get_rotation(sp), s, method=deformer.warp_surfels
        )
        return xyz_cam, rot_cam, s

    def f_warp(c, inp):
        dp, b, sp = inp
        xyz_cam, rot_cam, _ = warp_out(perturb(dp, c), b, sp)
        return jnp.sum(xyz_cam) + jnp.sum(rot_cam)

    report["warp_fwd_ms"], _ = timed(
        f_warp, (dparams, batch, sparams), args.iters
    )
    print(f"warp_fwd: {report['warp_fwd_ms']:.1f} ms", flush=True)

    # ---- warp grad ----------------------------------------------------
    def f_warp_grad(c, inp):
        dp, b, sp = inp

        def scalar(dp2, xyz, rot):
            s = deformer.apply(dp2, b, method=deformer.get_samples)
            xc, rc, _ = deformer.apply(
                dp2, xyz, rot, s, method=deformer.warp_surfels
            )
            return jnp.sum(xc) + jnp.sum(rc)

        g = jax.grad(scalar, argnums=(0, 1, 2))(
            perturb(dp, c), sp.xyz, sf.get_rotation(sp)
        )
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    report["warp_grad_ms"], _ = timed(
        f_warp_grad, (dparams, batch, sparams), args.iters
    )
    print(f"warp_grad: {report['warp_grad_ms']:.1f} ms", flush=True)

    # ---- raster fwd / grad at fixed cam-space inputs ------------------
    xyz_cam, rot_cam, samples = jax.jit(warp_out)(dparams, batch, sparams)
    intrins = geom.mat2K(geom.Kmatinv(samples["Kinv"]))
    bg = deformer.apply(dparams, method=deformer.background)
    dummy = jnp.zeros((xyz_cam.shape[0], args.surfels, 2), jnp.float32)

    def render_scalar(sp, xc, rc):
        out = render_surfels_batch(
            sp, alive, xc, rc, intrins, res, res, sh_degree, bg,
            raster_cfg, densify_dummy=dummy,
        )
        return (jnp.sum(out.color) + jnp.sum(out.alpha)
                + jnp.sum(out.depth))

    def f_raster_fwd(c, inp):
        sp, xc, rc = inp
        return render_scalar(perturb(sp, c), xc, rc)

    report["raster_fwd_ms"], _ = timed(
        f_raster_fwd, (sparams, xyz_cam, rot_cam), args.iters
    )
    print(f"raster_fwd: {report['raster_fwd_ms']:.1f} ms", flush=True)

    def f_raster_grad(c, inp):
        sp, xc, rc = inp
        g = jax.grad(render_scalar, argnums=(0, 1, 2))(
            perturb(sp, c), xc, rc
        )
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    report["raster_grad_ms"], _ = timed(
        f_raster_grad, (sparams, xyz_cam, rot_cam), args.iters
    )
    print(f"raster_grad: {report['raster_grad_ms']:.1f} ms", flush=True)

    # ---- full step (same path as bench.py) ----------------------------
    cfg = trainer._loss_config()
    weights = progress_schedule({**cfg, "reg_eikonal_wt": 0.0}, 1000)
    weights["lambda_normal"] = 0.0
    weights["lambda_dist"] = 0.0
    step = trainer._train_step
    state = (trainer.params, trainer.surfels, trainer.gs_adam,
             trainer.warp_opt_state)

    @jax.jit
    def run_full(state):
        def body(st, _):
            p, s, a, w = st
            p, s, a, w, m = step(p, s, a, w, batch, weights,
                                 use_2dgs_reg=False)
            return (p, s, a, w), m["total"]

        _, totals = jax.lax.scan(body, state, None, length=args.iters)
        return totals[-1]

    _ = float(run_full(state))
    _ = float(run_full(state))
    t0 = time.perf_counter()
    _ = float(run_full(state))
    report["full_ms"] = (time.perf_counter() - t0) / args.iters * 1000
    print(f"full: {report['full_ms']:.1f} ms", flush=True)

    report = {k: round(v, 1) for k, v in report.items()}
    report["unaccounted_ms"] = round(
        report["full_ms"] - report["warp_grad_ms"] - report["raster_grad_ms"],
        1,
    )
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
