"""Train the monodepth U-Net on scenes rendered by our own rasterizer.

The reference consumes ZoeDepth (torch.hub download, `preprocess/scripts/
depth.py:37-58`); zero egress means training in-repo instead. Scenes are
random textured surfel blobs at varied depths over textured background
planes, rendered with the 2DGS rasterizer — GT depth comes from the
alpha-normalized expected-depth channel. The loss is MiDaS-style
affine-invariant MAE + multi-scale gradient matching, so the network
learns depth *ordering* from occlusion/size/position cues (the affine
ambiguity is resolved downstream exactly as for any monocular prior).

    PYTHONPATH=. python scripts/train_depthnet.py --steps 1200 \
        --out vidu4d_tpu/weights/depthnet_synthetic.npz

Prints train loss every 100 steps and final held-out SSI-MAE + depth-order
accuracy vs the flow-parallax fallback.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidu4d_tpu.preprocess.depthnet import (
    DepthNet, align_affine, depth_loss, save_weights,
)


def _texture(rng, res, scales=(4, 8, 16, 32)):
    img = np.zeros((res, res, 3), np.float32)
    for s in scales:
        n = rng.normal(size=(s, s, 3)).astype(np.float32)
        img += np.asarray(
            jax.image.resize(jnp.asarray(n), (res, res, 3), "bilinear")
        ) / np.sqrt(s)
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img


def make_scene(rng, res, n_blobs=None):
    """One rendered scene: rgb (res,res,3), depth (res,res), valid mask."""
    from vidu4d_tpu.models.gaussian import surfels as sf
    from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize

    n_blobs = n_blobs or rng.integers(2, 6)
    pts, cols, scales_log = [], [], []
    for _ in range(n_blobs):
        n = int(rng.integers(60, 200))
        ctr = np.array([rng.uniform(-0.35, 0.35), rng.uniform(-0.35, 0.35),
                        rng.uniform(0.8, 3.0)], np.float32)
        rad = rng.uniform(0.05, 0.25)
        p = rng.normal(size=(n, 3)).astype(np.float32)
        p /= np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-6)
        p = ctr + p * rad * rng.uniform(0.6, 1.0, size=(n, 1))
        base = rng.uniform(0.1, 1.0, size=(1, 3))
        c = np.clip(base + rng.normal(0, 0.15, size=(n, 3)), 0, 1)
        pts.append(p)
        cols.append(c.astype(np.float32))
        scales_log.append(np.full((n,), np.log(rad * 0.35), np.float32))
    # background plane of large far splats (textured wall)
    nb = 256
    gx, gy = np.meshgrid(np.linspace(-2, 2, 16), np.linspace(-2, 2, 16))
    bgz = rng.uniform(3.5, 5.0)
    bgp = np.stack([gx.ravel(), gy.ravel(), np.full(nb, bgz)], -1)
    bgp += rng.normal(0, 0.05, bgp.shape)
    tex = _texture(rng, 16).reshape(-1, 3)
    pts.append(bgp.astype(np.float32))
    cols.append(tex.astype(np.float32))
    scales_log.append(np.full((nb,), np.log(0.25), np.float32))

    pts = np.concatenate(pts)
    cols = np.concatenate(cols)
    scales_log = np.concatenate(scales_log)

    # pad to a FIXED capacity so the rasterizer compiles once for the whole
    # training run (variable splat counts = one XLA compile per scene)
    cap = 1536
    n = len(pts)
    if n < cap:
        pad = cap - n
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        cols = np.concatenate([cols, np.zeros((pad, 3), np.float32)])
        scales_log = np.concatenate(
            [scales_log, np.full((pad,), np.log(1e-4), np.float32)]
        )
    else:
        pts, cols, scales_log = pts[:cap], cols[:cap], scales_log[:cap]

    state = sf.init_from_points(jnp.asarray(pts), jnp.asarray(cols),
                                capacity=cap, sh_degree=0)
    alive = state.alive & (jnp.arange(cap) < n)
    params = state.params._replace(
        opacity=jnp.full_like(state.params.opacity, 5.0),
        scaling=jnp.asarray(scales_log)[:, None]
        * jnp.ones_like(state.params.scaling),
    )
    f = rng.uniform(0.9, 1.5) * res
    intrins = jnp.asarray([f, f, res / 2, res / 2])
    out = rasterize(
        params.xyz, sf.get_rotation(params), sf.get_scaling(params),
        sf.get_opacity(params)[:, 0], jnp.eye(4), intrins, res, res,
        shs=sf.get_features(params), sh_degree=0,
        bg_color=jnp.asarray([0.0, 0.0, 0.0]), mask=alive,
        config=RasterizeConfig(budget=1024, tile_chunk=4),
    )
    a = np.asarray(out.alpha)
    rgb = np.asarray(out.color)
    depth = np.asarray(out.depth) / np.maximum(a, 1e-6)
    valid = (a > 0.5).astype(np.float32)
    depth = depth * valid + bgz * (1 - valid)  # holes -> wall depth
    valid = np.ones_like(valid)  # supervise everywhere (bg included)
    return rgb, depth.astype(np.float32), valid


def make_batch(rng, res, batch):
    rgbs, deps, vals = [], [], []
    for _ in range(batch):
        r, d, v = make_scene(rng, res)
        # photometric jitter
        r = np.clip(r * rng.uniform(0.7, 1.3)
                    + rng.normal(0, 0.02, r.shape), 0, 1)
        rgbs.append(r.astype(np.float32)); deps.append(d); vals.append(v)
    return (jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(deps)),
            jnp.asarray(np.stack(vals)))


def order_accuracy(disp, depth, rng, n_pairs=2000):
    """Fraction of random pixel pairs whose predicted depth ORDER matches
    GT (disparity flips the sign) — the alignment-free ranking metric."""
    h, w = depth.shape
    ii = rng.integers(0, h * w, size=(n_pairs, 2))
    d = depth.reshape(-1)[ii]
    p = np.asarray(disp).reshape(-1)[ii]
    keep = np.abs(d[:, 0] - d[:, 1]) > 0.05
    gt_near = d[:, 0] < d[:, 1]
    pred_near = p[:, 0] > p[:, 1]
    return float((gt_near == pred_near)[keep].mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--out", default="vidu4d_tpu/weights/depthnet_synthetic.npz")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    model = DepthNet(width=args.width)
    rgb, dep, val = make_batch(rng, args.res, args.batch)
    params = model.init(jax.random.PRNGKey(0), rgb)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"depthnet params: {n_params/1e6:.2f}M", flush=True)

    sched = optax.linear_onecycle_schedule(args.steps, args.lr)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rgb, dep, val):
        def loss_fn(p):
            disp = model.apply(p, rgb)
            return depth_loss(disp, dep, val)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    for it in range(args.steps):
        rgb, dep, val = make_batch(rng, args.res, args.batch)
        params, opt_state, loss = step(params, opt_state, rgb, dep, val)
        if it % 100 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    save_weights(args.out, params)
    print(f"saved {args.out}", flush=True)

    # held-out eval: SSI-MAE + ordering accuracy vs flow-parallax
    from vidu4d_tpu.preprocess.depth import depth_from_flow_parallax
    from vidu4d_tpu.preprocess.depthnet import ssi_mae

    rng_eval = np.random.default_rng(123)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    maes, accs, accs_fp = [], [], []
    for _ in range(4):
        rgb, dep, val = make_batch(rng_eval, args.res, args.batch)
        disp = fwd(params, rgb)
        gt_disp = 1.0 / jnp.maximum(dep, 1e-3)
        maes.append(float(ssi_mae(disp, gt_disp, val)))
        # flow-parallax "depth" from a static pair (identity jitter frame)
        for b in range(rgb.shape[0]):
            accs.append(order_accuracy(disp[b], np.asarray(dep[b]), rng_eval))
            fp = depth_from_flow_parallax(
                jnp.stack([jnp.asarray(rgb[b]).mean(-1)] * 2)
            )[0]
            accs_fp.append(
                order_accuracy(1.0 / np.maximum(np.asarray(fp), 1e-3),
                               np.asarray(dep[b]), rng_eval)
            )
    print(f"held-out: ssi_mae={np.mean(maes):.4f} "
          f"order_acc={np.mean(accs):.3f} "
          f"flow_parallax_order_acc={np.mean(accs_fp):.3f}", flush=True)


if __name__ == "__main__":
    main()
